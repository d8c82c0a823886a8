package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sliding-window rates (SURVEY.md §2 row 219): the 4-window cover per
  * event, epoch alignment, boundary membership, and the sum identity
  * Σ n over windows = 4 × events. */
class SlidingRatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600L * 1000000
  private val Q = 900L * 1000000 // 15 min in micros

  private def windows(us: Seq[Long]) =
    us.map(u => new Timestamp(u / 1000))
      .toDF("ts")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"w.start").as("s"), unix_micros($"w.end").as("e"), $"n")
      .orderBy($"s")
      .as[(Long, Long, Long)].collect().toSeq

  test("every event is covered by exactly 4 windows, epoch-aligned") {
    val got = windows(Seq(10 * H + 17 * 60 * 1000000))
    assert(got.size == 4)
    assert(got.forall(w => w._2 - w._1 == H && w._1 % Q == 0))
    // starts are the 4 slide multiples in (ts - 1h, ts]:
    // ts = 10h17m → floor to 10h15m, back 3 slides
    val top = 10 * H + Q // 10h15m
    assert(got.map(_._1) == Seq(top - 3 * Q, top - 2 * Q, top - Q, top))
  }

  test("an event exactly on a slide boundary starts a window there") {
    val got = windows(Seq(20 * H))
    assert(got.map(_._1).contains(20 * H))
    assert(!got.map(_._1).contains(20 * H + Q)) // window start is inclusive
  }

  test("window counts sum to 4x the event count") {
    val us = (1L to 500L).map(i => 5 * H + i * 7919L * 1000L)
    val got = windows(us)
    assert(got.map(_._3).sum == 4 * 500L)
  }
}
