package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Ties the row-237 batch lateness audit to REAL Structured Streaming
  * watermark semantics: the audit's p99 recommendation, used as the
  * withWatermark delay, must keep a windowed aggregation's drop rate
  * at the audited tail; a zero watermark on the same stream drops
  * every late event. */
class StreamLatenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 300 events in arrival order (id = arrival sequence); every 20th
  // arrives 150 s late (5% of the stream), far enough to straddle the
  // 100-event feed chunks. Audited lateness is vs the PRIOR arrival's
  // running max, so the measured tail is 149 s: p50 = p95 = 0 (95% on
  // time exactly), p99 = 149.
  private val events: Seq[(Long, java.sql.Timestamp)] =
    (0 until 300).map { i =>
      val late = if (i % 20 == 0 && i > 0) 150L else 0L
      (i.toLong, new java.sql.Timestamp((1000000L + i - late) * 1000))
    }

  private def streamDropCount(delaySec: Long, sink: String): Long = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = ms.toDS().toDF("event_id", "ts")
      .withWatermark("ts", s"$delaySec seconds")
      .groupBy(window(col("ts"), "10 seconds")).count()
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(sink).start()
    try {
      // three arrival chunks so the watermark really advances between
      // them, then a far-future sentinel to close every window
      events.grouped(100).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      ms.addData(Seq((9999L, new java.sql.Timestamp((1000000L + 10000) * 1000))))
      q.processAllAvailable()
      val counted = spark.table(sink).agg(sum(col("count"))).as[Long].head()
      // the sentinel's own window never closes, so it is never counted:
      // dropped = real events fed minus real events aggregated
      events.size - counted
    } finally q.stop()
  }

  test("the audit's p99 as watermark delay keeps drops at the audited tail") {
    val audit = Analytics.latenessAudit(
        events.toDF("event_id", "ts").withColumn("event_type", lit("s")),
        col("event_type"), col("ts"), col("event_id"))
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(audit._7 == 149L && audit._6 == 0L,
      s"the seeded profile must put p99 at 149s and p95 at 0: $audit")

    // p99 + one safety second (the boundary row ts == watermark sits
    // exactly on Spark's drop edge — the production rule is p99+ε)
    val dropsAtP99 = streamDropCount(audit._7 + 1, "lat_p99")
    assert(dropsAtP99 == 0L,
      s"watermark = p99+1 covers the audited disorder, got $dropsAtP99 drops")

    val dropsAtZero = streamDropCount(0L, "lat_zero")
    assert(dropsAtZero >= 10L,
      s"a zero watermark must drop the cross-chunk late events, got $dropsAtZero")
  }
}
