package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** kNN label-noise audit (SURVEY.md §2 row 207): the planted-flip
  * detection case, the clean-cluster zero, k-bounding, self
  * exclusion, majority tie-break, and partitioning invariance. */
class LabelNoiseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight clusters on orthogonal axes: ids 0-4 near +x (label 0),
  // ids 5-9 near +y (label 1); id 0 carries the WRONG label 1
  private def clustered(flip: Boolean) = (0 to 9).map { i =>
    val base = if (i < 5) Array(1f, 0.01f * i, 0f) else Array(0.01f * i, 1f, 0f)
    val lbl = if (i == 0 && flip) 1 else (if (i < 5) 0 else 1)
    (i.toLong, base, lbl)
  }

  private def audit(rows: Seq[(Long, Array[Float], Int)], pred: org.apache.spark.sql.Column,
                    k: Int, parts: Int = 1) =
    VectorOps.labelNoiseAudit(
        rows.toDF("vec_id", "embedding", "label").repartition(parts),
        "vec_id", "embedding", "label", pred, k)
      .orderBy($"vec_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("a planted label flip is fully contradicted by its neighborhood") {
    val got = audit(clustered(flip = true), col("vec_id") === 0, k = 4)
    // id 0 sits in the x-cluster whose other members carry label 0
    assert(got == Seq((0L, 1L, 4L, 4L, 0L)))
  }

  test("a clean cluster member disagrees with nobody") {
    val got = audit(clustered(flip = false), col("vec_id") === 2, k = 4)
    assert(got == Seq((2L, 0L, 4L, 0L, 0L)))
  }

  test("neighbor count is k-bounded and excludes self") {
    val got = audit(clustered(flip = false), col("vec_id") === 7, k = 100)
    assert(got.head._3 == 9L)
  }

  test("majority ties break to the smallest label") {
    // audited point equidistant-ish: 2 neighbors label 0, 2 label 2
    val rows = Seq(
      (0L, Array(1f, 0f, 0f), 9),
      (1L, Array(0.9f, 0.1f, 0f), 0), (2L, Array(0.9f, -0.1f, 0f), 0),
      (3L, Array(0.9f, 0f, 0.1f), 2), (4L, Array(0.9f, 0f, -0.1f), 2))
    val got = audit(rows, col("vec_id") === 0, k = 4)
    assert(got.head._5 == 0L && got.head._4 == 4L)
  }

  test("partitioning invariance") {
    val rows = (0 to 60).map { i =>
      (i.toLong, Array((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat),
        i % 4)
    }
    val pred = pmod(col("vec_id"), lit(3)) === 0
    assert(audit(rows, pred, 5, parts = 1) == audit(rows, pred, 5, parts = 13))
  }
}
