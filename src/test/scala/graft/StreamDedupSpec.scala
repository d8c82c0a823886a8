package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.FirstSeen

/** Streaming TTL'd exact dedup (SURVEY.md §2 row 216): first-wins
  * within and across micro-batches, (ts, id)-min determinism inside a
  * batch, TTL re-emission after the watermark passes the horizon, and
  * batch parity. */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private def run(batches: Seq[Seq[(Long, Long, Timestamp)]],
                  ttlMinutes: Int = 600): Seq[FirstSeen] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Timestamp)]
    val name = s"sdedup_${System.nanoTime()}"
    val q = StreamDedup.dedupFirst(
        ms.toDF().toDF("h", "doc_id", "ts"), ttlMinutes, "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[FirstSeen].collect().toSeq.sortBy(r => (r.h, r.doc_id))
    } finally q.stop()
  }

  test("duplicates within one micro-batch emit the earliest (ts, id) once") {
    val out = run(Seq(Seq((10L, 5L, ts(2)), (10L, 3L, ts(1)), (10L, 9L, ts(3)),
      (11L, 7L, ts(1)))))
    assert(out == Seq(FirstSeen(10, 3), FirstSeen(11, 7)))
  }

  test("duplicates across micro-batches emit nothing while state lives") {
    val out = run(Seq(
      Seq((1L, 100L, ts(0)), (2L, 200L, ts(0))),
      Seq((1L, 101L, ts(1)), (2L, 201L, ts(1)), (3L, 300L, ts(1))),
      Seq((1L, 102L, ts(2)))))
    assert(out == Seq(FirstSeen(1, 100), FirstSeen(2, 200), FirstSeen(3, 300)))
  }

  test("after the watermark passes the TTL horizon the hash re-emits") {
    // ttl 5 min; second arrival 100 min later, with a watermark-driving
    // other-hash event in between so the timer actually fires
    val out = run(Seq(
      Seq((7L, 1L, ts(0))),
      Seq((99L, 50L, ts(50))),  // advances the watermark past 0+5
      Seq((7L, 2L, ts(100)))), ttlMinutes = 5)
    assert(out == Seq(FirstSeen(7, 1), FirstSeen(7, 2), FirstSeen(99, 50)))
  }

  test("one micro-batch matches the batch (ts, id)-min exactly") {
    // across micro-batches the contract is ARRIVAL-order first-wins
    // (test above); within one batch it is the deterministic global min
    val docs = (1L to 300L).map(i => ((i * 7) % 40, i, ts(i % 30)))
    val out = run(Seq(docs))
    val batch = docs.groupBy(_._1).map { case (h, ds) =>
      FirstSeen(h, ds.map(d => (d._3.getTime, d._2)).min._2)
    }.toSeq.sortBy(r => (r.h, r.doc_id))
    assert(out == batch)
  }
}
