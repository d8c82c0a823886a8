package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Relational.dec2

/** Structured Streaming ingest (SURVEY.md §2.3 #47).
  *
  * The reference runs its ETL as a daily Airflow batch; here the same
  * hourly aggregation is expressed once and fed either from a batch
  * DataFrame (`q_hourly_events`) or from `readStream` with a watermark —
  * parity by construction, spec-verified against the batch result.
  */
object EventStream {

  /** `ts`'s physical encoding has varied across testdata generations
    * (TIMESTAMP(NANOS) → legacy LongType nanos; timestamp[us] naive →
    * TIMESTAMP_NTZ) — see Tables.nanosTsToMicros. The stream schema is
    * therefore probed from the files already present (one batch-side
    * footer read at stream construction, not per microbatch) rather
    * than hard-coded to one encoding. A stream started on an EMPTY
    * landing dir (files arrive later) cannot probe — it falls back to
    * the current-generation shape (naive timestamp[us] → NTZ), which
    * `nanosTsToMicros` normalizes like any other. */
  def eventsSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try spark.read.parquet(dir).schema
    catch { case _: org.apache.spark.sql.AnalysisException =>
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampNTZType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))
    }
  }

  /** Tumbling 1-hour aggregation; identical logic for batch and stream.
    * Groups on the `window()` column itself (not `window.start`) so
    * event-time watermark tracking survives into the aggregation. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming variant: watermarked so state is bounded (late events
    * beyond 2 hours are dropped — required for append-mode sinks and
    * for weeks-long runs at scale). */
  def hourlyAggStream(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))

  /** Read a parquet directory as a stream (file source discovers new
    * files as they land — the streaming twin of the reference's
    * raw-zone polling). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.sources.Tables.nanosTsToMicros(
      spark.readStream.schema(eventsSchema(spark, dir)).parquet(dir))
  }

  /** Run the hourly aggregation into an in-memory table (test/dev sink). */
  def startMemorySink(spark: SparkSession, dir: String, name: String): StreamingQuery =
    hourlyAggStream(readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName(name).start()

  /** Streaming dedup (SURVEY.md §9): drop re-deliveries of the same
    * event id within the watermark horizon — state is bounded by the
    * watermark, so an at-least-once source becomes effectively-once
    * without unbounded memory. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding 10 minutes. Watermarks on both
    * sides bound the join state (required for unbounded streams). */
  def purchasesAfterClicks(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      col("p_user") === col("c_user") &&
      col("click_ts") <= col("purchase_ts") &&
      col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES"))
  }
}
