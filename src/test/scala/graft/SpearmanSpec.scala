package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Regression

/** Spearman rank correlation (SURVEY.md §2 row 204): the ±1 monotone
  * anchors, a hand-computed middle case, the permutation-rank tie
  * contract, NULL exclusion, the n<2 degenerate, and partitioning
  * invariance. */
class SpearmanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rho(rows: Seq[(Long, Option[Long], Option[Long])], parts: Int = 1) =
    Regression.spearman(rows.toDF("id", "x", "y").repartition(parts),
        col("x"), col("y"), col("id"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head

  test("a strictly increasing relation scores exactly +1") {
    val rows = (1L to 20L).map(i => (i, Some(i * 3), Some(i * i)))
    val got = rho(rows)
    assert(got._2 == 0L && got._3 == got._4 && got._5.contains(1d))
  }

  test("a strictly decreasing relation scores exactly -1") {
    val rows = (1L to 20L).map(i => (i, Some(i), Some(100L - i)))
    val got = rho(rows)
    assert(got._3 == -got._4 && got._5.contains(-1d))
  }

  test("hand-computed: one swapped pair on n=4") {
    // x ranks 1,2,3,4; y ranks 1,3,2,4 → Σd² = 2
    // rho = (4·15 − 12) / 60 = 48/60
    val rows = Seq((1L, Some(10L), Some(10L)), (2L, Some(20L), Some(30L)),
      (3L, Some(30L), Some(20L)), (4L, Some(40L), Some(40L)))
    val got = rho(rows)
    assert(got == ((4L, 2L, 48L, 60L, Some(0.8d))))
  }

  test("ties rank by id — the documented permutation contract") {
    // x all equal → rx = id order = 1,2,3; y strictly increasing with
    // id → ry = 1,2,3 → Σd² = 0, rho = 1 (not the midrank 0)
    val rows = Seq((1L, Some(5L), Some(1L)), (2L, Some(5L), Some(2L)),
      (3L, Some(5L), Some(3L)))
    assert(rho(rows)._5.contains(1d))
  }

  test("NULL in either column excludes the row; n<2 gives NULL rho") {
    val rows = Seq((1L, Some(1L), Some(1L)), (2L, None, Some(2L)),
      (3L, Some(3L), None))
    val got = rho(rows)
    assert(got._1 == 1L && got._5.isEmpty)
  }

  test("partitioning invariance") {
    val rows = (1L to 400L).map(i =>
      (i, Some((i * 37L) % 101L), Some((i * 53L) % 97L)))
    assert(rho(rows, parts = 1) == rho(rows, parts = 13))
  }
}
