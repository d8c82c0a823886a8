package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse writes (SURVEY.md §2.1#13).
  *
  * The reference appends transformed frames to BigQuery
  * (WRITE_APPEND, load.py:184-207). Spark-first equivalent: parquet
  * append partitioned by day — at 100 TB, day partitioning is what
  * makes the downstream watermark query (`SELECT DISTINCT day`) a
  * metadata-only operation and gives incremental readers partition
  * pruning for free.
  */
object Writer {

  /** Append rows partitioned by `dayCol` (must be a yyyy-MM-dd string or
    * date column). */
  def appendByDay(df: DataFrame, path: String, dayCol: String = "day"): Unit =
    df.write.mode("append").partitionBy(dayCol).parquet(path)

  /** Read the landed table; `spark.read.parquet` on the partitioned root
    * recovers `day` as a partition column, so day filters prune. */
  def readTable(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The warehouse-side date inventory — with day partitioning this
    * reads footer metadata only. */
  def existingDays(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    readTable(spark, path).select(col("day")).distinct()

  /** Small-file compaction: rewrite a table into ~`targetBytes` files.
    *
    * Incremental appends (one file per micro-batch per partition) decay
    * scan performance at scale — a 100 TB table appended hourly reads
    * millions of tiny files, and file-open cost dominates. Compaction
    * sizes the output from the ACTUAL on-disk bytes (`inputFiles` +
    * filesystem stat, no data scan), then rewrites with one shuffle.
    * Returns the output file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Bucketed co-located layout (SURVEY.md §2.10): hash-cluster a table
    * ONCE into `buckets` files per partition on its join/agg key and
    * record the bucketing in the catalog. Every later equi-join or
    * aggregation on that key then reads the clustering instead of
    * re-shuffling — for the 100 TB fact⋈fact case (events⋈events,
    * corpus⋈signature-table) where neither side broadcasts, this is
    * the difference between shuffling petabytes per query and
    * shuffling them ONCE at layout time. `sortBy` additionally
    * pre-sorts each bucket so sort-merge joins skip their per-task
    * sort. Spark-native bucketing (not Hive's): the bucket file count
    * must match on both sides for the no-exchange plan, so pick
    * `buckets` for the TARGET cluster's reducer count, not the local
    * rig. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** ORC round-trip — same day-partitioned layout as the parquet path
    * (format breadth: parquet, CSV, JSON raw zone, ORC). */
  def appendByDayOrc(df: DataFrame, path: String, dayCol: String = "day"): Unit =
    df.write.mode("append").partitionBy(dayCol).orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV round-trip with an EXPLICIT schema — CSV carries no types, so
    * reading without one silently strings every column; the explicit
    * schema is the same alignment contract [[SchemaAlign]] enforces on
    * load (ref: load.py:104-181). Headers on, day-partitioned like the
    * other sinks.
    *
    * `multiLine` on read: the writer quotes embedded newlines (document
    * text has them), and the line-oriented default reader would split
    * such a quoted record into malformed rows. It is a throughput
    * trade, not a free default: a multiLine scan is NOT SPLITTABLE —
    * one whole file per task — so at the 100 TB design point a
    * newline-free CSV ingest should pass `multiLine = false` to keep
    * per-split parallelism (the parquet/ORC legs don't have this
    * trade; CSV is the interchange path). `enforceSchema=false`:
    * the default applies the user schema POSITIONALLY, silently
    * mis-assigning columns if the file's column order ever drifts —
    * with it off, a header/schema name mismatch fails loudly (the
    * by-name alignment the docstring promises). */
  def appendByDayCsv(df: DataFrame, path: String, dayCol: String = "day"): Unit =
    df.write.mode("append").option("header", "true").partitionBy(dayCol).csv(path)

  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              multiLine: Boolean = true): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      .option("enforceSchema", "false")
      .schema(schema).csv(path)
}
