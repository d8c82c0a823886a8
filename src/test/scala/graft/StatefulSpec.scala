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
}
