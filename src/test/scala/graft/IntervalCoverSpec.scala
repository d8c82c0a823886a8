package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Interval union / coverage (SURVEY.md §2 row 224): overlap merging,
  * the swallowed-interval case that breaks plain-lag sweep lines,
  * touching-interval merging, gap measurement, per-user isolation, and
  * partitioning invariance. */
class IntervalCoverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 60L * 1000000

  private def cover(rows: Seq[(Long, Long, Long)], wUs: Long, parts: Int = 1) =
    Analytics.intervalCoverage(
        rows.map { case (e, u, us) =>
          val t = new Timestamp(us / 1000)
          t.setNanos(((us % 1000000) * 1000).toInt)
          (e, u, t)
        }.toDF("event_id", "user_id", "ts").repartition(parts),
        col("user_id"), col("ts"), col("event_id"), wUs)
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("overlapping windows merge; disjoint ones count separately") {
    // w = 5 min: events at 0 and 3 merge into [0, 8); event at 20 alone
    val got = cover(Seq((1L, 1L, 0L), (2L, 1L, 3 * M), (3L, 1L, 20 * M)), 5 * M)
    assert(got == Seq((1L, 2L, 13 * M, 12 * M)))
  }

  test("a long interval swallowing a short one does not split the union") {
    // w = 30 min: [0, 30); event at 5 → [5, 35) overlaps; event at 32
    // is INSIDE [5,35) — plain lag on the previous END (35) is fine,
    // but event at 10 then 32: prev end by lag = 40... construct the
    // classic: events 0 (w=30 → [0,30)), 1 ([1,31)), 29 ([29,59)):
    // all one interval [0,59)
    val got = cover(Seq((1L, 1L, 0L), (2L, 1L, 1 * M), (3L, 1L, 29 * M)), 30 * M)
    assert(got == Seq((1L, 1L, 59 * M, 0L)))
  }

  test("touching intervals merge (start == running max end)") {
    // w = 5: [0,5) and [5,10): start 5 is NOT > 5 → merged
    val got = cover(Seq((1L, 1L, 0L), (2L, 1L, 5 * M)), 5 * M)
    assert(got == Seq((1L, 1L, 10 * M, 0L)))
  }

  test("max gap is between consecutive MERGED intervals") {
    // merged: [0,5), [10,15), [30,35) → gaps 5, 15 → max 15
    val got = cover(Seq((1L, 1L, 0L), (2L, 1L, 10 * M), (3L, 1L, 30 * M)), 5 * M)
    assert(got == Seq((1L, 3L, 15 * M, 15 * M)))
  }

  test("users are isolated") {
    val got = cover(Seq((1L, 1L, 0L), (2L, 2L, 2 * M)), 5 * M)
    assert(got == Seq((1L, 1L, 5 * M, 0L), (2L, 1L, 5 * M, 0L)))
  }

  test("partitioning invariance") {
    val rows = (1L to 400L).map(i => (i, i % 9, (i * 7919L) % 100000L * 1000000L))
    assert(cover(rows, 300 * M, parts = 1) == cover(rows, 300 * M, parts = 13))
  }
}
