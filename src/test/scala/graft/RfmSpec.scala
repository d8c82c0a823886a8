package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** RFM scoring (SURVEY.md §2 row 225): exact cents, monotone scores,
  * ties share a score (the NTILE contrast), the uniform quintile
  * split, and partitioning invariance. */
class RfmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rfm(rows: Seq[(Long, Long, Double)], parts: Int = 1) =
    Analytics.rfmScores(
        rows.map { case (u, min, v) =>
          (u, new Timestamp(1700000000000L + min * 60000L), v) }
          .toDF("user_id", "ts", "value").repartition(parts),
        col("user_id"), col("ts"), col("value"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("monetary totals are exact cents") {
    val got = rfm(Seq((1L, 0L, 0.1), (1L, 1L, 0.2)))
    assert(got.head._4 == 30L)
  }

  test("uniform users split into the full 1..5 score range, monotone") {
    // 10 users, user u has u events, spend u·1.00, last event at minute u
    val rows = (1L to 10L).flatMap(u => (1L to u).map(j => (u, u, 1.0)))
    val got = rfm(rows)
    assert(got.map(_._5) == got.map(_._5).sorted) // recency monotone in u
    assert(got.map(_._6) == got.map(_._6).sorted) // frequency monotone
    assert(got.map(_._6).distinct == Seq(1L, 2L, 3L, 4L, 5L))
    // freq == monetary here (1.00 each) → identical scores
    assert(got.map(_._6) == got.map(_._7))
  }

  test("tied values share a score — never split like NTILE") {
    val rows = (1L to 8L).map(u => (u, u, 5.0)) // all spend 5.00 once
    val got = rfm(rows)
    assert(got.map(_._7).distinct.size == 1)
    assert(got.map(_._6).distinct.size == 1)
  }

  test("partitioning invariance") {
    val rows = (1L to 500L).map(i => (i % 23, i % 97, (i % 7) + 0.25))
    assert(rfm(rows, parts = 1) == rfm(rows, parts = 13))
  }
}
