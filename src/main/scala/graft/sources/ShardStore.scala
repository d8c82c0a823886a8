package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style maintenance for the landed shard table
  * ([[graft.operators.TrainingPipeline.writeShards]] layout: parquet
  * partitioned by (split, lang), rows clustered by (bin, doc_id)).
  *
  * Incremental ingests APPEND — shipped files are immutable — and
  * retractions land as a `_tombstones` side table (underscore-prefixed,
  * so Spark's parquet reader never sees it as data). [[read]] applies
  * tombstones logically (one anti-join, AQE broadcasts the small side);
  * [[compact]] applies them physically and merges the small files
  * appends accumulate — the read path's anti-join cost and the
  * file-open cost both reset to zero.
  *
  * The compaction swap is delete-then-rename, NOT atomic: a reader
  * racing the swap can glimpse a missing root. That is the honest
  * limit of bare parquet — at deployment scale this table graduates to
  * a format with a transactional pointer (Delta/Iceberg) and this
  * object's surface maps 1:1 onto it (append = append, tombstone =
  * delete, compact = OPTIMIZE).
  */
object ShardStore {

  private def tombDir(root: String) = root + "/_tombstones"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Manifest rows + their text, clustered and landed. Fails loudly if
    * a manifest row has no document (stale or filtered input).
    *
    * `maxRecordsPerFile` (0 = unbounded) bounds shard-file size — the
    * knob a training-data reader wants ("one shard file ≈ one worker's
    * chunk") — and, because rows are clustered by (bin, doc_id), it
    * makes each file a contiguous bin range: a bin-range read then
    * skips whole files' row groups on parquet min/max stats
    * (ShardPruningSpec measures exactly that). */
  private def land(docs: DataFrame, manifest: DataFrame, root: String,
                   mode: String, maxRecordsPerFile: Long): Unit = {
    val missing = manifest
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
    require(missing == 0,
      s"$missing manifest rows have no document in `docs` — stale or filtered input?")
    manifest.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("bin"), col("doc_id"))
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split", "lang").parquet(root)
  }

  /** Land the bootstrap manifest (overwrites the root). */
  def init(docs: DataFrame, manifest: DataFrame, root: String,
           maxRecordsPerFile: Long = 0L): Unit =
    land(docs, manifest, root, "overwrite", maxRecordsPerFile)

  /** Land one ingest's accepted rows (appends; bins were opened past
    * each group's historical max, so clustering stays monotone across
    * the appended files). */
  def append(batchDocs: DataFrame, accepted: DataFrame, root: String,
             maxRecordsPerFile: Long = 0L): Unit =
    land(batchDocs, accepted, root, "append", maxRecordsPerFile)

  /** Record retractions: (doc_id, reason) appended to the side table. */
  def addTombstones(tombstones: DataFrame, root: String): Unit =
    tombstones.select(col("doc_id"), col("reason"))
      .write.mode("append").parquet(tombDir(root))

  /** The live table: every landed row minus tombstoned docs. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val all = spark.read.parquet(root)
    if (!fs(spark, root).exists(new Path(tombDir(root)))) all
    else all.join(
      spark.read.parquet(tombDir(root)).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Compact when the table's maintenance debt crosses a threshold —
    * the scheduling policy an ingest loop calls after every append:
    * too many files per (split, lang) partition (file-open cost decays
    * scans) or too large a tombstoned fraction (the read-path anti-join
    * carries dead weight). Debt is measured from file listings and the
    * tombstone table only — no data scan. Returns Some(fileCount) when
    * compaction ran. */
  def maybeCompact(spark: SparkSession, root: String,
                   maxFilesPerPartition: Int = 16,
                   maxTombstoneFrac: Double = 0.2,
                   maxRecordsPerFile: Long = 0L): Option[Int] = {
    val df = spark.read.parquet(root)
    val files = df.inputFiles.length
    val partitions = math.max(1,
      df.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length)
    val tombFrac = if (!fs(spark, root).exists(new Path(tombDir(root)))) 0.0
      else {
        val dead = spark.read.parquet(tombDir(root))
          .select(col("doc_id")).distinct().count()
        // manifest rows == live + dead docs; parquet count() is
        // footer-metadata-only, no column data is read
        dead.toDouble / math.max(1L, df.count())
      }
    if (files > partitions.toLong * maxFilesPerPartition || tombFrac > maxTombstoneFrac)
      Some(compact(spark, root, maxRecordsPerFile))
    else None
  }

  /** Physically apply tombstones and merge accumulated small files:
    * rewrite the live rows fully re-clustered, swap the rewrite in,
    * drop the tombstone table. Returns the data file count after the
    * swap. */
  def compact(spark: SparkSession, root: String,
              maxRecordsPerFile: Long = 0L): Int = {
    val tmp = root + "__compact_tmp"
    // read() is lazy — the rewrite job below is the only materialization,
    // and it finishes before the swap touches the original files
    read(spark, root)
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("bin"), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split", "lang").parquet(tmp)
    val f = fs(spark, root)
    require(f.delete(new Path(root), true), s"could not drop $root for the swap")
    require(f.rename(new Path(tmp), new Path(root)), s"could not swap $tmp into $root")
    spark.read.parquet(root).inputFiles.length
  }
}
