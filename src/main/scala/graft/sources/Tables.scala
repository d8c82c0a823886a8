package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed accessors for the synthetic warehouse (TESTDATA.md).
  *
  * Mirrors the reference's landing-zone/table catalog role
  * (ref: composer_dags/.../etl/load.py:46-63 — GCS raw zone + BQ tables),
  * re-expressed as a parquet catalog. Reads are plain `spark.read.parquet`
  * so Catalyst pushes projections/predicates into the scan; at cluster
  * scale the same calls read partitioned directories with partition
  * pruning — no code change needed.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** Normalize `events.ts` to session-TZ TIMESTAMP regardless of how the
    * generator encoded it. Three shapes exist across testdata generations:
    *   - TIMESTAMP(NANOS) parquet → Spark's vectorized reader rejects it;
    *     with the legacy `nanosAsLong` conf it lands as LongType nanos,
    *     truncated here to µs with integer division (`ts div 1000` — a
    *     double division would lose precision at 2^63 ns). DuckDB applies
    *     the same truncation on read, so both engines see identical values.
    *   - timestamp[us] without timezone → Spark reads TIMESTAMP_NTZ;
    *     cast to TIMESTAMP is value-preserving under the UTC session TZ
    *     the engine pins, and matches DuckDB's naive-µs reading.
    *   - timestamp[us] UTC-adjusted → already TIMESTAMP, passed through.
    * Shared by the batch (events) and streaming (EventStream.readEvents)
    * paths — they must normalize identically or their parity breaks. */
  def nanosTsToMicros(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nanosTsToMicros(load(s, d, "events"))
  }

  /** Time-bounded events scan WITH pushdown: the µs conversion above is
    * an expression over the raw column, so a filter on converted `ts`
    * cannot reach the parquet reader — at 100 TB that is a full scan.
    * This applies the bound to the raw nanos column first (statistics /
    * row-group pruning applies), then converts. */
  def eventsRange(s: SparkSession, d: String,
                  startMicros: Long, endMicros: Long): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.filter(col("ts") >= startMicros * 1000 && col("ts") < endMicros * 1000)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // NTZ literals fold to constants, so the bound still reaches the
        // scan (row-group pruning applies); the cast to TIMESTAMP happens
        // only after the filter, on the surviving rows.
        df.filter(col("ts") >= expr(s"cast(timestamp_micros(${startMicros}L) as timestamp_ntz)") &&
                  col("ts") < expr(s"cast(timestamp_micros(${endMicros}L) as timestamp_ntz)"))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        df.filter(col("ts") >= expr(s"timestamp_micros(${startMicros}L)") &&
                  col("ts") < expr(s"timestamp_micros(${endMicros}L)"))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every warehouse table as a temp view so the engine is
    * drivable through `spark.sql(...)` as well as the DataFrame API
    * (the views are the same lazy scans — pushdown, pruning and the
    * events ns→µs handling all apply identically; SQL over a view
    * plans the same physical query as the accessor call). Combined
    * with [[graft.GraftExtensions]]'s SQL-registered functions, a
    * SQL-only user gets the full relational surface. */
  def registerViews(s: SparkSession, d: String): Unit =
    all.foreach { name =>
      val df = if (name == "events") events(s, d) else load(s, d, name)
      df.createOrReplaceTempView(name)
    }
}
