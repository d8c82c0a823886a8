package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming/batch parity: the same hourly aggregation through
  * Structured Streaming (memory sink) equals the batch result. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming hourly agg equals batch hourly agg") {
    // File-stream sources want a directory; stage the single parquet file.
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"${TestSpark.sf}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.startMemorySink(spark, dir.toString, "hourly_out")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly_out")
    val batch = EventStream.hourlyAgg(
      graft.sources.Tables.events(spark, TestSpark.sf))

    // Append mode only emits windows the watermark has closed; every
    // emitted row must match its batch twin, and most windows close.
    val joined = streamed.join(batch, Seq("hour", "event_type", "n", "total_value"))
    assert(streamed.count() > 0)
    assert(joined.count() == streamed.count())
    assert(streamed.count() >= batch.count() / 2)
  }

  test("a stream can start on an empty landing dir (schema falls back, files arrive later)") {
    val dir = Files.createTempDirectory("graft_stream_empty")
    // probing an empty dir must not throw — the fallback shape applies
    val schema = EventStream.eventsSchema(spark, dir.toString)
    assert(schema.fieldNames.contains("ts"))
    val q = EventStream.startMemorySink(spark, dir.toString, "hourly_late")
    try {
      q.processAllAvailable() // zero batches, no data yet
      Files.copy(Paths.get(s"${TestSpark.sf}/events.parquet"),
        dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
    } finally q.stop()
    // the late-arriving file flows through the same normalized-ts path
    assert(spark.table("hourly_late").count() > 0)
  }

  test("streaming top tokens equals the batch sketch (bounded state, complete mode)") {
    val dir = Files.createTempDirectory("graft_tok_stream")
    Files.copy(Paths.get(s"${TestSpark.sf}/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = graft.streaming.TokenStream.startMemorySink(spark, dir.toString, "top_tokens_out")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("top_tokens_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.streaming.TokenStream.topTokens(
        graft.sources.Tables.documents(spark, TestSpark.sf), k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // capacity (64) exceeds the corpus vocabulary, so both are exact
    // counts with the same deterministic (cnt desc, token) order
    assert(streamed == batch && streamed.size == 10)
  }
}
