package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Watermark-delay audit (SURVEY.md §2 row 237): hand-computed
  * lateness, in-order zero case, bucketed == single-window parity,
  * the integer percentile rule, and plan/partitioning pins. */
class LatenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("hand-computed lateness: arrival order vs event time") {
    // arrivals (id order): t=100, t=90 (10s late), t=120, t=95 (25s late)
    val e = Seq((1L, "a", ts(100)), (2L, "a", ts(90)),
      (3L, "a", ts(120)), (4L, "a", ts(95))).toDF("event_id", "event_type", "ts")
    val got = Analytics.eventLateness(e, $"event_type", $"ts", $"event_id")
      .orderBy($"id").select($"late_us").as[Long].collect().toSeq
    assert(got == Seq(0L, 10000000L, 0L, 25000000L))
  }

  test("streams are independent per type; in-order stream is all zeros") {
    val e = Seq((1L, "a", ts(100)), (2L, "b", ts(10)),
      (3L, "a", ts(101)), (4L, "b", ts(11))).toDF("event_id", "event_type", "ts")
    val got = Analytics.eventLateness(e, $"event_type", $"ts", $"event_id")
      .select($"late_us").as[Long].collect().toSeq
    assert(got.forall(_ == 0L))
  }

  test("bucketed running max == the single-window form at every shift") {
    // deterministic disorder: event time jitters backwards by a
    // hash-derived offset
    val e = spark.range(5000).select(
      col("id").as("event_id"),
      concat(lit("t"), pmod(col("id"), lit(3))).as("event_type"),
      timestamp_micros(col("id") * 1000000L -
        pmod(xxhash64(col("id")), lit(90L)) * 1000000L).as("ts"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = e.select(col("event_type"), col("event_id").as("id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("late_us", greatest(lit(0L),
        coalesce(max(col("us")).over(w), col("us")) - col("us")))
      .orderBy(col("id")).select(col("late_us")).as[Long].collect().toSeq
    assert(ref.exists(_ > 0L), "sanity: the jitter must produce real lateness")
    for (shift <- Seq(4, 8, 12)) {
      val got = Analytics.eventLateness(e, col("event_type"), col("ts"),
          col("event_id"), bucketShift = shift)
        .orderBy(col("id")).select(col("late_us")).as[Long].collect().toSeq
      assert(got == ref, s"shift=$shift diverged")
    }
  }

  test("audit percentiles follow the 100·cum >= q·n integer rule") {
    // arrivals 1..94 in order (peak ts 1094), then five events whose
    // lateness vs that running max is 9,8,7,6,5 s, then one 94 s late
    val rows = (1 to 94).map(i => (i.toLong, "a", ts(1000 + i))) ++
      (95 to 99).map(i => (i.toLong, "a", ts(1000 + i - 10))) ++
      Seq((100L, "a", ts(1000)))
    val e = rows.toDF("event_id", "event_type", "ts")
    val got = Analytics.latenessAudit(e, $"event_type", $"ts", $"event_id")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._2 == 100L && got._3 == 6L)
    assert(got._5 == 0L, "p50 on time")
    assert(got._6 == 5L, "p95: first band with cum >= 95 is the 5s band")
    assert(got._7 == 9L, "p99: first band with cum >= 99 is the 9s band")
    assert(got._4 == 94L * 1000000L, "max = 1094 - 1000 = 94s")
  }

  test("per-event windows partition by (type, bucket); no corpus-wide window") {
    val e = Seq((1L, "a", ts(1))).toDF("event_id", "event_type", "ts")
    val p = Analytics.eventLateness(e, $"event_type", $"ts", $"event_id")
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(event_type#\\d+, __b#".r.findFirstIn(p).nonEmpty, p)
    // the only type-alone window rides the bucket cut frame (ordered
    // by __b), never raw events
    assert("windowspecdefinition\\(event_type#\\d+, (?!__b#)".r.findFirstIn(p)
      .forall(_.contains("__b")), p)
  }

  test("partitioning invariance") {
    val e = spark.range(2000).select(col("id").as("event_id"),
      lit("a").as("event_type"),
      timestamp_micros(col("id") * 500000L -
        pmod(xxhash64(col("id")), lit(40L)) * 1000000L).as("ts"))
    def run(parts: Int) =
      Analytics.latenessAudit(e.repartition(parts), col("event_type"),
          col("ts"), col("event_id"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(run(1) == run(11))
  }
}
