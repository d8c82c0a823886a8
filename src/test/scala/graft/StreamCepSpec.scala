package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cep
import graft.streaming.StreamCep
import graft.streaming.StreamCep.{CepEvent, Dfa}

/** Streaming CEP (§2 row 154): event-time-correct pattern matching on
  * an out-of-order stream, parity with the batch matcher. */
class StreamCepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, tMin: Long, typ: String) =
    (id, new Timestamp(tMin * 60000), user, typ)

  test("advance: multi-match resets past the last matched row") {
    val evs = Seq(
      CepEvent(1, 100, 1, "a"), CepEvent(1, 200, 2, "b"),
      CepEvent(1, 300, 3, "a"), CepEvent(1, 400, 4, "b"))
    val (ms, dfa) = StreamCep.advance(1L, Dfa(Nil, Nil), evs, Vector("a", "b"))
    assert(ms.map(_.ids) == Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(dfa.mts.isEmpty)
  }

  test("advance: strict-after rule matches the batch matcher") {
    // b at the same ts as a must not complete the pattern
    val evs = Seq(CepEvent(1, 100, 1, "a"), CepEvent(1, 100, 2, "b"),
      CepEvent(1, 500, 3, "b"))
    val (ms, _) = StreamCep.advance(1L, Dfa(Nil, Nil), evs, Vector("a", "b"))
    assert(ms.map(_.ids) == Seq(Seq(1L, 3L)))
  }

  test("a late-but-within-watermark event wins over an earlier arrival") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamCep.matchPattern(
        in.toDS().toDF("event_id", "ts", "user_id", "event_type"),
        Seq("a", "b"), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("cep_out").start()
    try {
      // batch 1: a@100 and b@120 arrive; watermark -> 110, so b@120 is
      // still unripe and the DFA must NOT consume it yet
      in.addData(ev(1, 7, 100, "a"), ev(2, 7, 120, "b"))
      q.processAllAvailable()
      // batch 2: b@115 arrives LATE (after b@120 in arrival order, before
      // it in event time) + a watermark pusher at t=140 (-> wm 130)
      in.addData(ev(3, 7, 115, "b"), ev(4, 9, 140, "x"))
      q.processAllAvailable()
      val out = spark.table("cep_out")
        .select(col("user_id"), col("ids")).as[(Long, Seq[Long])]
        .collect().toSeq
      // the match pairs a@100 with the event-time-earlier b@115, never b@120
      assert(out == Seq((7L, Seq(1L, 3L))), out.toString)
    } finally q.stop()
  }

  test("stream first-match agrees with batch firstMatch per user") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(1, 1, 100, "view"), ev(2, 1, 105, "click"), ev(3, 1, 109, "purchase"),
      ev(4, 2, 100, "click"), ev(5, 2, 103, "view"), ev(6, 2, 108, "purchase"), // no click after view
      ev(7, 3, 101, "view"), ev(8, 3, 102, "click")) // incomplete
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamCep.matchPattern(
        in.toDS().toDF("event_id", "ts", "user_id", "event_type"),
        Seq("view", "click", "purchase"), "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("cep_parity").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(ev(99, 10000, 150, "x")) // watermark pusher ripens everything
      q.processAllAvailable()
      val streamed = spark.table("cep_parity")
        .select(col("user_id"), col("ids")).as[(Long, Seq[Long])]
        .collect().toMap
      val batch = Cep.firstMatch(
          events.toDF("event_id", "ts", "user_id", "event_type"),
          Seq("view", "click", "purchase"), Seq("user_id"))
        .select(col("user_id"), array(col("id_0"), col("id_1"), col("id_2")).as("ids"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(batch.nonEmpty && streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("sub-millisecond timestamps keep full precision and strict-after order") {
    implicit val sqlCtx = spark.sqlContext
    // a and b sit INSIDE the same millisecond: a at .000250, b at
    // .000750. The ms-truncating conversion collapsed both to the same
    // ts_us, so the strict-after rule (ts_us > mts.last) rejected the
    // match; full-precision conversion must accept it.
    def evUs(id: Long, user: Long, us: Long, typ: String) = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      (id, t, user, typ)
    }
    val base = 6000000000L // 100 min in us
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamCep.matchPattern(
        in.toDS().toDF("event_id", "ts", "user_id", "event_type"),
        Seq("a", "b"), "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("cep_subms").start()
    try {
      in.addData(evUs(1, 5, base + 250, "a"), evUs(2, 5, base + 750, "b"),
        evUs(9, 6, base + 120000000L, "x")) // watermark pusher
      q.processAllAvailable()
      val out = spark.table("cep_subms")
        .select(col("user_id"), col("ts"), col("ids"))
        .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
      assert(out == Seq((5L, Seq(base + 250, base + 750), Seq(1L, 2L))),
        out.toString)
    } finally q.stop()
  }

  test("state drains and is dropped for completed users") {
    // pure-function proxy for the state contract: an empty buffer and
    // a stage-0 DFA after a match means remove() — advance must end at
    // stage 0 when the pattern completed exactly
    val (ms, dfa) = StreamCep.advance(1L, Dfa(Nil, Nil),
      Seq(CepEvent(1, 1, 1, "a"), CepEvent(1, 2, 2, "b")), Vector("a", "b"))
    assert(ms.size == 1 && dfa.mts.isEmpty && dfa.mids.isEmpty)
  }
}
