package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native session_window aggregation (SURVEY.md §2 row 217): the
  * built-in's boundary convention (break at gap >= g), end = last +
  * gap, equal-ts merging, and the no-window plan shape. */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private def sessions(rows: Seq[(Long, Timestamp, Double)]) =
    rows.toDF("user_id", "ts", "value")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"user_id", $"sw.start", $"sw.end", $"n", $"v")
      .orderBy($"user_id", $"sw.start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq

  test("a gap of exactly 30 minutes MERGES (adjacent windows touch)") {
    // sessions are [start, last+gap) and merge when they overlap or
    // touch — the break is strictly gap > g
    val got = sessions(Seq((1L, ts(0), 1d), (1L, ts(30), 2d)))
    assert(got == Seq((1L, ts(0), ts(60), 2L, 3d)))
  }

  test("a gap over 30 minutes breaks the session") {
    val got = sessions(Seq((1L, ts(0), 1d), (1L, ts(31), 2d)))
    assert(got == Seq(
      (1L, ts(0), ts(30), 1L, 1d),
      (1L, ts(31), ts(61), 1L, 2d)))
  }

  test("a gap under 30 minutes merges; end is last event + gap") {
    val got = sessions(Seq((1L, ts(0), 1d), (1L, ts(29), 2d)))
    assert(got == Seq((1L, ts(0), ts(59), 2L, 3d)))
  }

  test("equal timestamps always co-session") {
    val got = sessions(Seq((1L, ts(5), 1d), (1L, ts(5), 2d)))
    assert(got.size == 1 && got.head._4 == 2L)
  }

  test("the plan is a session-window aggregate, not a lag/cumsum window") {
    val plan = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("session_window"), plan)
    assert(!plan.contains("WindowExec"), plan)
  }
}
