package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Frequent-path mining (SURVEY.md §2 row 184): per-user windowing,
  * the tie-deterministic order, truncated tails, top-k ordering, and
  * partitioning invariance. */
class EventPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(60000L * m)

  private def paths(rows: Seq[(Long, Timestamp, Long, String)],
                    n: Int = 3, k: Int = 10, parts: Int = 1) =
    Analytics.frequentPaths(
        rows.toDF("user_id", "ts", "event_id", "event_type").repartition(parts),
        col("user_id"), col("ts"), col("event_id"), col("event_type"), n, k)
      .as[(String, Long)].collect().toSeq

  test("paths never cross user boundaries") {
    val rows = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (2L, ts(3), 3L, "c"), (2L, ts(4), 4L, "d"))
    // no user has 3 events → no trigram
    assert(paths(rows) == Seq.empty)
    assert(paths(rows, n = 2) ==
      Seq(("a>b", 1L), ("c>d", 1L)))
  }

  test("sliding trigrams with counts and deterministic top-k order") {
    val rows = Seq("a", "b", "a", "b", "a").zipWithIndex.map {
      case (t, i) => (1L, ts(i), i.toLong, t) }
    val got = paths(rows)
    assert(got == Seq(("a>b>a", 2L), ("b>a>b", 1L)))
  }

  test("equal timestamps order by event_id") {
    val rows = Seq(
      (1L, ts(1), 10L, "x"), (1L, ts(1), 11L, "y"), (1L, ts(1), 12L, "z"))
    assert(paths(rows) == Seq(("x>y>z", 1L)))
  }

  test("k truncates after (count DESC, path ASC)") {
    // user u emits three 'eu' events → three distinct paths, count 1
    val rows = (0 until 9).map(i =>
      ((i % 3).toLong, ts(i), i.toLong, s"e${i % 3}"))
    val got = paths(rows, k = 2)
    assert(got == Seq(("e0>e0>e0", 1L), ("e1>e1>e1", 1L)))
  }

  test("partitioning invariance") {
    val rows = (1 to 300).map(i =>
      ((i % 7).toLong, ts(i), i.toLong, s"e${i % 4}"))
    assert(paths(rows, parts = 1) == paths(rows, parts = 13))
  }
}
