package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** Classifier calibration table (SURVEY.md §2 row 181): bucket
  * arithmetic, range coverage, the constant-score guard, label
  * counting, and partitioning invariance. */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cal(rows: Seq[(Long, Long)], bins: Int, parts: Int = 1) =
    Classify.calibrationTable(
        rows.toDF("score", "y").repartition(parts), "score", "y", bins)
      .orderBy($"bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed buckets over [0, 9] with 2 bins") {
    // width = (9-0+1)/2: scores 0..4 → bin 0, 5..9 → bin 1
    val rows = (0L to 9L).map(s => (s, if (s >= 5) 1L else -1L))
    val got = cal(rows, bins = 2)
    assert(got == Seq((0L, 5L, 0L, 0L, 4L), (1L, 5L, 5L, 5L, 9L)))
  }

  test("max score lands in the top bucket, never out of range") {
    val got = cal(Seq((0L, 1L), (100L, 1L)), bins = 10)
    assert(got.map(_._1) == Seq(0L, 9L))
  }

  test("negative scores bucket correctly (floor, not truncation)") {
    val got = cal(Seq((-10L, -1L), (-1L, 1L), (9L, 1L)), bins = 2)
    // range [-10, 9], width 10: -10..-1 → 0, 0..9 → 1
    assert(got == Seq((0L, 2L, 1L, -10L, -1L), (1L, 1L, 1L, 9L, 9L)))
  }

  test("constant margin collapses to bucket 0") {
    val got = cal(Seq((7L, 1L), (7L, -1L), (7L, 1L)), bins = 10)
    assert(got == Seq((0L, 3L, 2L, 7L, 7L)))
  }

  test("empty buckets are absent, not zero rows") {
    val got = cal(Seq((0L, 1L), (99L, -1L)), bins = 10)
    assert(got.map(_._1) == Seq(0L, 9L))
  }

  test("partitioning invariance on a perceptron-shaped workload") {
    val rows = (1L to 200L).map(i => ((i * 37) % 101 - 50, if (i % 3 == 0) 1L else -1L))
    assert(cal(rows, 10, parts = 1) == cal(rows, 10, parts = 13))
  }
}
