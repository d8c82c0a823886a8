package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingOps

/** Walk-forward folds with embargo (SURVEY.md §2 row 199): boundary
  * arithmetic on a hand-built series, embargo exclusion, conservation
  * per fold, zero-embargo degeneracy, and partitioning invariance. */
class WalkForwardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tsOf(us: Long) = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def folds(us: Seq[Long], k: Int, embargo: Long, parts: Int = 1) =
    TrainingOps.walkForwardFolds(
        us.map(tsOf).toDF("ts").repartition(parts), col("ts"), k, embargo)
      .orderBy($"fold")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed boundaries and counts, k=2, embargo=10") {
    // series 0..89 step 10 → mn=0, mx=80, seg=81
    // fold 1: test_start=27, test_end=54, train_end=17
    //   train: 0,10 → 2; embargo: 20 → 1; test: 30,40,50 → 3
    // fold 2: test_start=54, test_end=81, train_end=44
    //   train: 0..40 → 5; embargo: 50 ∈ [44,54) → 1; test: 60,70,80 → 3
    val got = folds((0L to 80L by 10L), k = 2, embargo = 10L)
    assert(got == Seq(
      (1L, 17L, 27L, 54L, 2L, 1L, 3L),
      (2L, 44L, 54L, 81L, 5L, 1L, 3L)))
  }

  test("zero embargo makes train end exactly at test start") {
    val got = folds((0L to 80L by 10L), k = 2, embargo = 0L)
    assert(got.forall(r => r._2 == r._3) &&
      got.forall(r => r._6 == 0L))
  }

  test("every event lands in exactly one bucket of its covering fold") {
    // for each fold: n_train + n_embargo + n_test + (events >= test_end)
    // + (events between train_end.. none: embargo covers) == total
    val us = (0L until 300L by 7L)
    val got = folds(us, k = 3, embargo = 5L)
    got.foreach { r =>
      val after = us.count(_ >= r._4)
      assert(r._5 + r._6 + r._7 + after == us.size)
    }
  }

  test("the last fold's test window includes the max timestamp") {
    val us = Seq(0L, 50L, 100L)
    val got = folds(us, k = 1, embargo = 1L)
    assert(got.head._7 >= 1L && got.head._4 == 101L)
  }

  test("partitioning invariance") {
    val us = (1L to 400L).map(i => (i * 9973L) % 100000L)
    assert(folds(us, 5, 1000L, parts = 1) == folds(us, 5, 1000L, parts = 13))
  }
}
