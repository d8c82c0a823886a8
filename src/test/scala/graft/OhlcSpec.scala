package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Daily OHLC bars (SURVEY.md §2 row 230): hand-computed bars, the
  * same-instant id tiebreak, day boundaries, exact cents, NULL
  * exclusion, and partitioning invariance. */
class OhlcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Day = 86400000L
  private def ts(ms: Long) = new Timestamp(1704067200000L + ms) // 2024-01-01 UTC

  private def ohlc(rows: Seq[(Long, String, Timestamp, Option[Double])],
                   parts: Int = 1) =
    Analytics.dailyOhlc(
        rows.toDF("event_id", "event_type", "ts", "value").repartition(parts),
        col("event_type"), col("ts"), col("event_id"), col("value"))
      .orderBy($"series", $"day")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed bar: open is first, close is last, high/low exact") {
    val rows = Seq(
      (1L, "m", ts(1000), Some(5.00)),
      (2L, "m", ts(2000), Some(9.25)),
      (3L, "m", ts(3000), Some(1.50)),
      (4L, "m", ts(4000), Some(7.00)))
    val got = ohlc(rows)
    assert(got == Seq(("m", "2024-01-01", 4L, 500L, 925L, 150L, 700L)))
  }

  test("same-instant open resolves by event id") {
    val rows = Seq((9L, "m", ts(0), Some(2.0)), (1L, "m", ts(0), Some(3.0)))
    val got = ohlc(rows).head
    assert(got._4 == 300L && got._7 == 200L) // open = id 1, close = id 9
  }

  test("events split across midnight form separate bars") {
    val rows = Seq((1L, "m", ts(Day - 1), Some(1.0)), (2L, "m", ts(Day), Some(2.0)))
    val got = ohlc(rows)
    assert(got.map(_._2) == Seq("2024-01-01", "2024-01-02"))
  }

  test("NULL values are excluded from the bar") {
    val rows = Seq((1L, "m", ts(0), Some(4.0)), (2L, "m", ts(1), None))
    val got = ohlc(rows).head
    assert(got._3 == 1L && got._7 == 400L)
  }

  test("partitioning invariance") {
    val rows = (1L to 400L).map(i =>
      (i, s"t${i % 3}", ts(i * 977 * 1000L), Some((i % 89) + 0.25)))
    assert(ohlc(rows, parts = 1) == ohlc(rows, parts = 13))
  }
}
