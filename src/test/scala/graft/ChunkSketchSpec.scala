package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, SketchOps}
import graft.sources.Tables
import graft.streaming.EventStream

/** Chunking reconstruction, HLL accuracy, streaming dedup. */
class ChunkSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunks cover every token with the configured overlap") {
    val df = Seq((1L, (1 to 80).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, "text", chunkSize = 32, overlap = 8)
      .orderBy("chunk_id")
      .select($"chunk_id", $"n_tokens", $"chunk_text").as[(Long, Long, String)].collect()
    // 80 tokens, stride 24 -> candidate starts 1,25,49,73; 73 is within
    // `overlap` of the end (its tokens all sit inside chunk 2) -> dropped
    assert(chunks.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(chunks.map(_._2).toSeq == Seq(32L, 32L, 32L))
    assert(chunks(0)._3.startsWith("t1 ") && chunks(2)._3 == (49 to 80).map(i => s"t$i").mkString(" "))
    // consecutive chunks share exactly `overlap` tokens
    val c0 = chunks(0)._3.split(" ").toSeq
    val c1 = chunks(1)._3.split(" ").toSeq
    assert(c0.takeRight(8) == c1.take(8))
  }

  test("HLL union estimate lands within 5% of exact") {
    val r = SketchOps.hllUsersEstimate(spark, TestSpark.sf)
      .select($"approx_users", $"exact_users").as[(Long, Long)].head()
    val (approx, exact) = r
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, r)
  }

  test("register-image q_hll_users: ALL row dominates every day, estimates stay sane") {
    val rows = SketchOps.hllUsersQ(spark, TestSpark.sf)
      .select($"day", $"reg_sum", $"n_filled", $"exact_users")
      .as[(String, Long, Long, Long)].collect()
    val all = rows.find(_._1 == "ALL").get
    val days = rows.filterNot(_._1 == "ALL")
    assert(days.nonEmpty)
    // max-merge monotonicity: the merged registers dominate each day's
    assert(days.forall { case (_, rs, nf, ex) =>
      rs <= all._2 && nf <= all._3 && ex <= all._4 })
    // the ALL summary can never exceed the union bound of the days
    assert(all._2 <= days.map(_._2).sum && all._4 <= days.map(_._4).sum)
  }

  test("spark builtin approx_count_distinct stays within 10% of exact per flag") {
    val rows = Tables.lineitem(spark, TestSpark.sf)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("a"),
        countDistinct($"l_partkey").as("e"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, a, e) => math.abs(a - e).toDouble / e <= 0.10 },
      rows.mkString(", "))
  }

  test("streaming dedup drops re-delivered event ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = ms.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.dedupEvents(df)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    // base well above epoch 0 — the initial watermark is 0, and an event
    // at exactly the watermark is dropped as late
    val base = 86400000L * 365
    def ev(id: Long, tMin: Long) = (id, new java.sql.Timestamp(base + tMin * 60000), 1L, "click", 1.0)
    try {
      ms.addData(ev(1, 0), ev(2, 1), ev(1, 0)) // dup within batch
      q.processAllAvailable()
      ms.addData(ev(2, 1), ev(3, 2)) // re-delivery across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("text tiling: the topic shift is the valley; same-topic boundaries are not") {
    // 40 words of vocabulary A, then 40 of vocabulary B, w = 20:
    // boundaries at 20 (A|A), 40 (A|B), 60 (B|B) — 40 is the cut
    val a = (1 to 40).map(i => s"alpha${i % 5}").mkString(" ")
    val b = (1 to 40).map(i => s"beta${i % 5}").mkString(" ")
    val got = Chunking.textTiling(
        Seq((1L, s"$a $b")).toDF("doc_id", "text"), "doc_id", "text", w = 20)
      .orderBy($"boundary_pos")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq(20L, 40L, 60L))
    assert(got(0)._3 == 5L && got(1)._3 == 0L && got(2)._3 == 5L)
    assert(got.map(_._4) == Seq(false, true, false)) // only the shift is a valley
  }

  test("text tiling: short docs emit no boundaries; exact 2w emits one non-valley") {
    val short = Chunking.textTiling(
      Seq((1L, (1 to 39).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", w = 20)
    assert(short.count() == 0)
    val exact = Chunking.textTiling(
        Seq((1L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", w = 20)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(exact == Seq((1L, 20L, 0L, false))) // edge boundary can't be a valley
    // NULL text == empty doc (no boundaries), not legacy size(NULL) = -1
    val nul = Chunking.textTiling(
      Seq((1L, null: String)).toDF("doc_id", "text"), "doc_id", "text", w = 20)
    assert(nul.count() == 0)
  }
}
