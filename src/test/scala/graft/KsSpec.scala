package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Regression

/** Two-sample KS statistic (SURVEY.md §2 row 271): hand-computed
  * values, tie handling, the deterministic argmax, and the bucketed
  * cumulative decomposition's parity on a continuous-valued frame
  * (the AucSpec posture for the same scale cure). */
class KsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ks(rows: Seq[(Double, String)]) =
    Regression.ksTest(rows.toDF("value", "g"), col("value"), col("g"), "a", "b")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().head

  test("disjoint supports give D = 1") {
    val r = ks(Seq((1.0, "a"), (2.0, "a"), (10.0, "b"), (11.0, "b")))
    // at v=2: F_a=1, F_b=0 -> |2*2 - 2*0| = 4 = n_a*n_b
    assert(r == ((2L, 2L, 4L, 4L, 2.0, Some(1.0))))
  }

  test("identical samples give D = 0 and d_at = the smallest value") {
    val r = ks(Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b")))
    assert(r._3 == 0L && r._6 == Some(0.0))
    assert(r._5 == 1.0) // every value ties at 0; argmax breaks to MIN(s)
  }

  test("hand-computed mixed case with ties across groups") {
    // a: 1,2,3   b: 2,4  (n_a=3, n_b=2, den=6)
    // v=1: |2*1-3*0|=2; v=2: |2*2-3*1|=1; v=3: |2*3-3*1|=3; v=4: |6-6|=0
    val r = ks(Seq((1.0, "a"), (2.0, "a"), (3.0, "a"), (2.0, "b"), (4.0, "b")))
    assert(r._1 == 3L && r._2 == 2L)
    assert(r._3 == 3L && r._4 == 6L && r._5 == 3.0)
    assert(r._6 == Some(3.0 / 6.0))
  }

  test("rows outside the two groups and NULL values are ignored") {
    val df = Seq((Some(1.0), "a"), (Some(5.0), "b"), (Some(9.0), "c"),
      (None: Option[Double], "a")).toDF("value", "g")
    val r = Regression.ksTest(df, col("value"), col("g"), "a", "b")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().head
    assert(r._1 == 1L && r._2 == 1L && r._3 == 1L && r._4 == 1L)
  }

  test("continuous-valued frame: bucketed decomposition equals the single-window form") {
    // 50k distinct continuous doubles — the shape that makes the
    // distinct-value frame corpus-sized and forces the bucket path
    val rows = (1 to 50000).map { i =>
      val v = math.sin(i.toDouble) * 1000.0 + i * 1e-7
      (v, if (i % 3 == 0) "a" else "b")
    }
    val df = rows.toDF("value", "g")
    val got = Regression.ksTest(df, col("value"), col("g"), "a", "b")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().head
    // reference: exact single-pass computation on the driver
    val na = rows.count(_._2 == "a").toLong
    val nb = rows.count(_._2 == "b").toLong
    var ca = 0L; var cb = 0L; var best = -1L; var bestAt = Double.NaN
    rows.sortBy(_._1).foreach { case (v, g) =>
      if (g == "a") ca += 1 else cb += 1
      val d = math.abs(nb * ca - na * cb)
      if (d > best) { best = d; bestAt = v }
    }
    assert(got._1 == na && got._2 == nb)
    assert(got._3 == best, s"got ${got._3} want $best")
    assert(got._5 == bestAt)
  }

  test("ks is invariant to input partitioning") {
    val df = (1 to 5000).map(i => ((i % 97).toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("value", "g")
    val x = Regression.ksTest(df, col("value"), col("g"), "a", "b").collect().toSeq
    val y = Regression.ksTest(df.repartition(13), col("value"), col("g"), "a", "b")
      .collect().toSeq
    assert(x == y)
  }

  private def mwu(rows: Seq[(Double, String)]) =
    Regression.mannWhitneyU(rows.toDF("value", "g"), col("value"), col("g"),
        "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head

  test("mwu: hand-computed U with a tie; u2_a + u2_b = 2*n*m") {
    // A = [1,2,3], B = [2,4]: #(a>b) = 1 (3>2), ties = 1 (2=2)
    // 2U_A = 3; tie term: value 2 has t=2 -> t^3-t = 6
    val r = mwu(Seq((1.0, "a"), (2.0, "a"), (3.0, "a"), (2.0, "b"), (4.0, "b")))
    assert((r._1, r._2, r._3, r._4, r._5) == ((3L, 2L, 3L, 9L, 6L)))
    assert(r._3 + r._4 == 2L * r._1 * r._2)
  }

  test("mwu: total dominance gives u2_a = 2*n*m and a positive z") {
    val r = mwu(Seq((10.0, "a"), (11.0, "a"), (1.0, "b"), (2.0, "b")))
    assert(r._3 == 8L && r._4 == 0L && r._5 == 0L)
    assert(r._6.exists(_ > 0.0))
  }

  test("mwu: identical singletons are all ties -> zero variance -> NULL z") {
    val r = mwu(Seq((5.0, "a"), (5.0, "b")))
    assert(r._3 == 1L && r._4 == 1L && r._6.isEmpty)
  }

  test("mwu: symmetric samples give u2_a = u2_b = n*m and z = 0") {
    val r = mwu(Seq((1.0, "a"), (4.0, "a"), (2.0, "b"), (3.0, "b")))
    assert(r._3 == 4L && r._4 == 4L && r._6 == Some(0.0))
  }

  test("mwu is invariant to input partitioning") {
    val df = (1 to 400).map(i =>
      ((i * 37 % 101).toDouble / 7.0, if (i % 3 == 0) "a" else "b"))
      .toDF("value", "g")
    val x = Regression.mannWhitneyU(df, col("value"), col("g"), "a", "b")
      .collect().toSeq
    val y = Regression.mannWhitneyU(df.repartition(13), col("value"), col("g"),
      "a", "b").collect().toSeq
    assert(x == y)
  }
}
