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
  * The compaction swap is crash-safe ([[DirSwap]]: the old root moves
  * aside before the rewrite moves in, so no crash point loses data —
  * [[read]] and [[compact]] self-heal an interrupted swap), but not
  * atomic: a reader racing the swap can still glimpse a missing root
  * for an instant. That residue is the honest limit of bare parquet —
  * at deployment scale this table graduates to a format with a
  * transactional pointer (Delta/Iceberg) and this object's surface
  * maps 1:1 onto it (append = append, tombstone = delete, compact =
  * OPTIMIZE).
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
  /** In-partition clustering strategies share one landing path so the
    * validation and writer contract cannot diverge between layouts.
    * Both sorts lead with the partition columns so the dynamic-
    * partition writer preserves them (the ShardPruningSpec lesson). */
  private val plainCluster: DataFrame => DataFrame = df =>
    df.repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("bin"), col("doc_id"))

  private val zCluster: DataFrame => DataFrame = df =>
    graft.operators.ZOrder.withZValueQuantile(df, "bin", "n_tokens", "__z")
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("__z"))
      .drop("__z")

  private def land(docs: DataFrame, manifest: DataFrame, root: String,
                   mode: String, maxRecordsPerFile: Long,
                   cluster: DataFrame => DataFrame = plainCluster): Unit = {
    val missing = manifest
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
    require(missing == 0,
      s"$missing manifest rows have no document in `docs` — stale or filtered input?")
    cluster(manifest.join(docs.select(col("doc_id"), col("text")), Seq("doc_id")))
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split", "lang").parquet(root)
  }

  /** Land the bootstrap manifest (overwrites the root). */
  def init(docs: DataFrame, manifest: DataFrame, root: String,
           maxRecordsPerFile: Long = 0L): Unit =
    land(docs, manifest, root, "overwrite", maxRecordsPerFile)

  /** [[init]] with rows clustered by the quantile Z-VALUE of
    * (bin, n_tokens) instead of plain (bin, doc_id) order — each shard
    * file then covers a small RECTANGLE of the (bin, token-length)
    * space, so parquet min/max stats prune a size-bounded bin-range
    * read ("bins 40..60, docs under 512 tokens" — the shape a
    * length-bucketed training reader issues) on BOTH predicates.
    * The single-column layout answers the same query by opening every
    * file in the bin range regardless of the token bound
    * (ShardZOrderSpec measures the gap). The trade: a pure bin-range
    * scan with no token filter prunes somewhat worse than the plain
    * layout, because rectangles split bin locality across z-cells —
    * pick the clustering for the table's dominant read shape.
    * Quantile (not uniform-width) ranks keep the cells row-balanced
    * under token-length skew ([[graft.operators.ZOrder]]). */
  def initZOrdered(docs: DataFrame, manifest: DataFrame, root: String,
                   maxRecordsPerFile: Long = 0L): Unit =
    land(docs, manifest, root, "overwrite", maxRecordsPerFile, zCluster)

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

  /** The live table: every landed row minus tombstoned docs. Heals an
    * interrupted compaction swap first (root missing but the rewrite
    * or the moved-aside original present — see [[DirSwap.recover]]). */
  def read(spark: SparkSession, root: String): DataFrame = {
    if (!fs(spark, root).exists(new Path(root)))
      DirSwap.recover(fs(spark, root), root)
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
    * carries dead weight).
    *
    * The caller passes the doc counts it already has — `liveDocs` is
    * the state manifest's row count and `deadDocs` the tombstones it
    * has landed (both maintained by the ingest loop's own state, e.g.
    * [[graft.sources.StateStore]]) — so the debt check runs ZERO Spark
    * jobs: file and partition counts come from two directory globs
    * (no datasource resolution, no parquet footers — at very large
    * file counts even listing belongs in a manifest, which is the
    * Delta/Iceberg graduation). Returns Some(fileCount) when
    * compaction ran. */
  def maybeCompact(spark: SparkSession, root: String,
                   liveDocs: Long, deadDocs: Long,
                   maxFilesPerPartition: Int,
                   maxTombstoneFrac: Double,
                   maxRecordsPerFile: Long): Option[Int] = {
    val f = fs(spark, root)
    DirSwap.recover(f, root)
    val partitions = math.max(1,
      f.globStatus(new Path(s"$root/*/*")).count(_.isDirectory))
    val files = f.globStatus(new Path(s"$root/*/*/*"))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val tombFrac = deadDocs.toDouble / math.max(1L, liveDocs + deadDocs)
    if (files > partitions.toLong * maxFilesPerPartition || tombFrac > maxTombstoneFrac)
      Some(compact(spark, root, maxRecordsPerFile))
    else None
  }

  /** [[maybeCompact]] for standalone callers WITHOUT maintained doc
    * counts: derives the dead count from the tombstone table and the
    * total from the data table's footers — two metadata-only Spark
    * jobs (documented driver cost; prefer the counted overload from an
    * ingest loop). */
  def maybeCompact(spark: SparkSession, root: String,
                   maxFilesPerPartition: Int = 16,
                   maxTombstoneFrac: Double = 0.2,
                   maxRecordsPerFile: Long = 0L): Option[Int] = {
    // heal a mid-swap root BEFORE the data read — every other entry
    // point (read/compact/counted overload) self-heals; this one must
    // not throw on a state they would recover
    DirSwap.recover(fs(spark, root), root)
    val dead = if (!fs(spark, root).exists(new Path(tombDir(root)))) 0L
      else spark.read.parquet(tombDir(root)).select(col("doc_id")).distinct().count()
    // total landed rows == live + dead docs (doc_id unique per row)
    val total = spark.read.parquet(root).count()
    maybeCompact(spark, root, liveDocs = total - dead, deadDocs = dead,
      maxFilesPerPartition, maxTombstoneFrac, maxRecordsPerFile)
  }

  /** Physically apply tombstones and merge accumulated small files:
    * rewrite the live rows fully re-clustered, swap the rewrite in
    * crash-safely ([[DirSwap]]), drop the tombstone table (it lives
    * inside the root, so the swap drops it with the old files).
    * Returns the data file count after the swap. */
  def compact(spark: SparkSession, root: String,
              maxRecordsPerFile: Long = 0L): Int = {
    val f = fs(spark, root)
    DirSwap.recover(f, root)
    // read() is lazy — the rewrite job below is the only materialization,
    // and it finishes before the swap touches the original files
    read(spark, root)
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("bin"), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split", "lang").parquet(DirSwap.tmpDir(root))
    DirSwap.swap(f, root)
    spark.read.parquet(root).inputFiles.length
  }
}
