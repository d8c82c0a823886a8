package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Embedding snapshot drift (SURVEY.md §2 row 222): hand-computed
  * per-dim integers, the identical-snapshot zero, planted single-dim
  * drift localization, one-sided snapshots, and partitioning
  * invariance. */
class EmbedDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drift(rows: Seq[(Long, Array[Float])], parts: Int = 1) =
    VectorOps.snapshotDrift(
        rows.toDF("vec_id", "embedding").repartition(parts),
        col("vec_id"), "embedding", pmod(col("vec_id"), lit(2)))
      .orderBy($"dim")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed per-dim integers") {
    // snap0: [1.0, 2.0]; snap1: [3.0, 2.0]
    val got = drift(Seq(0L -> Array(1f, 2f), 1L -> Array(3f, 2f)))
    assert(got == Seq(
      (0L, 1L, 1L, 1000000L, 3000000L, -2000000L, 1L),
      (1L, 1L, 1L, 2000000L, 2000000L, 0L, 1L)))
  }

  test("identical snapshots drift zero on every dimension") {
    val vecs = (0L to 19L).map(i => i -> Array((i / 2 % 5).toFloat, 0.5f, -1f))
    val got = drift(vecs)
    assert(got.forall(_._6 == 0L))
  }

  test("a planted single-dimension shift is localized to that dim") {
    val vecs = (0L to 19L).map { i =>
      val v = Array(1f, 1f, 1f)
      if (i % 2 == 1) v(1) += 2f
      i -> v
    }
    val got = drift(vecs)
    assert(got.filter(_._6 != 0L).map(_._1) == Seq(1L))
  }

  test("a one-sided corpus reports zero counts for the missing snapshot") {
    val got = drift(Seq(0L -> Array(1f), 2L -> Array(2f)))
    assert(got == Seq((0L, 2L, 0L, 3000000L, 0L, 0L, 0L)))
  }

  test("partitioning invariance") {
    val vecs = (0L to 99L).map(i =>
      i -> Array((i % 7).toFloat, (i % 3) * 0.25f, (i % 11).toFloat))
    assert(drift(vecs, parts = 1) == drift(vecs, parts = 13))
  }
}
