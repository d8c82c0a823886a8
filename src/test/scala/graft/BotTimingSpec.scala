package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Timing-regularity bot audit (SURVEY.md §2 row 210): the clockwork
  * bot flag, the bursty human negative, the volume guard, hand-traced
  * variance integers, single-event exclusion, and partitioning
  * invariance. */
class BotTimingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def audit(rows: Seq[(Long, Long, Long)], parts: Int = 1) =
    Analytics.timingRegularity(
        rows.map { case (e, u, sec) => (e, u, new Timestamp(sec * 1000L)) }
          .toDF("event_id", "user_id", "ts").repartition(parts),
        col("user_id"), col("ts"), col("event_id"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq

  test("a clockwork stream at volume is flagged; a bursty one is not") {
    val bot = (0L until 25L).map(i => (i, 1L, 1000L + i * 10L))
    val human = (0L until 25L).map(i => (100L + i, 2L, 1000L + i * i * 7L))
    val got = audit(bot ++ human)
    assert(got.find(_._1 == 1L).get._9 === true)
    assert(got.find(_._1 == 2L).get._9 === false)
  }

  test("hand-traced variance integers") {
    // gaps 2, 4: n=2, Σg=6, Σg²=20 → var_num = 40−36 = 4, den = 4
    val rows = Seq((1L, 7L, 100L), (2L, 7L, 102L), (3L, 7L, 106L))
    val got = audit(rows).head
    assert(got == ((7L, 2L, 6L, 20L, 2L, 4L, 4L, 4L, false)))
  }

  test("constant gaps give exactly zero variance but need volume to flag") {
    val rows = (0L until 5L).map(i => (i, 3L, i * 60L))
    val got = audit(rows).head
    assert(got._7 == 0L && got._9 === false)
  }

  test("single-event users have no gaps and no row") {
    assert(audit(Seq((1L, 9L, 100L))).isEmpty)
  }

  test("partitioning invariance") {
    val rows = (1L to 500L).map(i => (i, i % 13, (i * 37L) % 9973L))
    assert(audit(rows, parts = 1) == audit(rows, parts = 13))
  }
}
