package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.TrainingPipeline
import graft.sources.ShardStore

/** Continuous corpus ingestion: a stream of documents drives the FULL
  * incremental training pipeline ([[TrainingPipeline.runIncremental]])
  * micro-batch by micro-batch — quality gates, exact + near dedup
  * against everything ever ingested, split assignment, retroactive
  * decontamination, packing — landing accepted rows and tombstones in
  * the [[ShardStore]] and committing the next state version.
  *
  * State is VERSIONED: each batch writes `root/v<N+1>` (never touching
  * `v<N>`, which it is concurrently reading) and then flips the
  * `LATEST` pointer — the manifest-pointer pattern, which also gives
  * state time travel for free.
  *
  * Failure semantics (bare parquet, no transactional format):
  * foreachBatch is at-least-once, and a REPLAYED batch whose commit
  * went through is detected by its `BATCH_<id>` marker and skipped
  * outright. A replay that lost the race between the shard append and
  * the marker can double-append — that residual window is the honest
  * limit of bare parquet; with content addressing the STATE never
  * corrupts either way, because every replayed document is an exact
  * dup of itself and the pipeline drops it (`runIncremental` replays
  * are structural no-ops). At deployment scale the store graduates to
  * Delta/Iceberg and the window closes.
  */
object CorpusIngest {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def latestPath(root: String) = new Path(s"$root/LATEST")

  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    if (!f.exists(latestPath(root))) None
    else {
      val in = f.open(latestPath(root))
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Write state as `v<next>` and flip LATEST (tmp + rename). */
  def commit(spark: SparkSession, state: TrainingPipeline.CorpusState,
             root: String): Long = {
    val v = latestVersion(spark, root).getOrElse(-1L) + 1L
    TrainingPipeline.saveState(state, s"$root/v$v")
    val f = fs(spark, root)
    val tmp = new Path(s"$root/LATEST.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(latestPath(root))) f.delete(latestPath(root), false)
    require(f.rename(tmp, latestPath(root)), s"could not flip $root/LATEST")
    v
  }

  /** Latest committed state; an untouched root loads the empty-corpus
    * bootstrap (so the very first batch needs no special casing). */
  def load(spark: SparkSession, root: String): TrainingPipeline.CorpusState =
    latestVersion(spark, root) match {
      case Some(v) => TrainingPipeline.loadState(spark, s"$root/v$v")
      case None =>
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("lang", StringType),
            StructField("text", StringType))))
        TrainingPipeline.bootstrapState(empty)
    }

  /** One micro-batch: skip if already committed, else ingest + land +
    * commit. Exposed for tests and for batch-mode callers that want
    * the same exactly-once-per-batch bookkeeping. */
  def ingestBatch(batch: DataFrame, batchId: Long,
                  stateRoot: String, shardRoot: String,
                  cfg: TrainingPipeline.Config = TrainingPipeline.Config()): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, stateRoot)
    val marker = new Path(s"$stateRoot/BATCH_$batchId")
    if (f.exists(marker)) return
    val delta = TrainingPipeline.runIncremental(load(spark, stateRoot), batch, cfg)
    ShardStore.append(batch, delta.accepted, shardRoot)
    ShardStore.addTombstones(delta.tombstones, shardRoot)
    commit(spark, delta.state, stateRoot)
    f.create(marker, true).close()
  }

  /** Wire a document stream (doc_id, lang, text) into the ingest loop. */
  def start(docs: DataFrame, stateRoot: String, shardRoot: String,
            checkpoint: String,
            cfg: TrainingPipeline.Config = TrainingPipeline.Config()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, stateRoot, shardRoot, cfg)
      }
      .start()
}
