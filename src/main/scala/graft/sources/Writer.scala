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
}
