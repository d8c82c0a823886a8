package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{SessionEvent, OpenSession}

/** flatMapGroupsWithState sessionization (SURVEY.md §2.3#47). */
class StatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = 60L * 1000000 // one minute in micros

  test("step folds events into sessions deterministically") {
    val (closed, open) = StatefulSessions.step(
      None,
      Seq(SessionEvent(1, 0, 1.0), SessionEvent(1, 5 * M, 2.0),
        SessionEvent(1, 50 * M, 3.0)),
      StatefulSessions.gapMicros(30))
    assert(closed.map(_._1) == Seq(OpenSession(0, 5 * M, 2, 3.0)))
    assert(open.contains(OpenSession(50 * M, 50 * M, 1, 3.0)))
  }

  test("streaming sessionization emits closed sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(ms.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      ms.addData(SessionEvent(7, 0, 1.0), SessionEvent(7, 10 * M, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open

      ms.addData(SessionEvent(7, 60 * M, 5.0)) // 50-min gap closes it
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .as[StatefulSessions.SessionOut].collect().toSeq
      assert(out == Seq(StatefulSessions.SessionOut(7, 0, 10 * M, 2, 3.0)))
    } finally q.stop()
  }

  test("event-time timeout flushes a churned user's final session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 86400000L * 365
    def ts(tMin: Long) = new java.sql.Timestamp(base + tMin * 60000)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = ms.toDS().toDF("user_id", "ts", "value")
    val q = StatefulSessions.sessionizeWithFlush(df, gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("flush_out").start()
    try {
      ms.addData((7L, ts(0), 1.0), (7L, ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("flush_out").count() == 0) // open, watermark at ~4min

      // another user far in the future advances the watermark past
      // user 7's gap horizon (5 + 30 min) -> timeout fires
      ms.addData((8L, ts(120), 1.0))
      q.processAllAvailable()
      ms.addData((8L, ts(121), 1.0)) // one more batch so the timeout executes
      q.processAllAvailable()
      val flushed = spark.table("flush_out")
        .as[StatefulSessions.SessionOut].collect().filter(_.user_id == 7L).toSeq
      assert(flushed == Seq(StatefulSessions.SessionOut(7,
        (base + 0) * 1000, (base + 5 * 60000) * 1000, 2, 3.0)))
    } finally q.stop()
  }
}
