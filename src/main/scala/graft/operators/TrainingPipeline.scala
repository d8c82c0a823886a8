package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** The corpus→shards flow end-to-end, one call — the training-data
  * counterpart of [[HealthPipeline.runOnce]]. Every stage is an
  * already-verified §2.5 operator; this composes them in the canonical
  * order a pre-training data pipeline runs them:
  *
  *  1. quality gate — score floor ([[Curation.score]]) + repetition
  *     rules ([[CorpusOps.repetitionStats]])
  *  2. exact dedup — normalized-hash keep-lowest-id
  *     ([[Curation.dedupKeepFirst]])
  *  3. near-dup resolution — MinHash-LSH pairs → connected components
  *     → keep each group's canonical (min-id) doc ([[Dedup]])
  *  4. deterministic split assignment ([[TrainingOps.assignSplit]])
  *  5. decontamination — drop TRAIN docs that leak into the test split
  *     ([[TrainingOps.decontaminate]]; the test set is the thing being
  *     protected, so the train side pays)
  *  6. token-budget packing per (split, lang)
  *     ([[TrainingOps.packBinned]])
  *
  * Stage order matters and is load-bearing: dedup runs before the
  * split so a dup pair can't straddle train/test (the cheapest
  * decontamination is the dedup you already did), and decontamination
  * runs after the split because it is DEFINED by the split.
  *
  * Everything is one linear chain of the operators' own shuffles; no
  * stage adds driver state, so the composition inherits the 100 TB
  * posture of its parts.
  */
object TrainingPipeline {

  final case class Config(
      minQuality: Double = 0.55,
      maxTopFrac: Double = 0.12,
      maxDup2Frac: Double = 0.55,
      nearDupThreshold: Double = 0.5,
      trainPct: Int = 80,
      valPct: Int = 10,
      decontShingle: Int = 8,
      packCapacity: Long = 2048L)

  /** Returns the shard manifest: one row per surviving document —
    * (split, lang, bin, doc_id, n_tokens), where `bin` is the
    * token-budget pack within (split, lang). */
  def run(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // 1. quality gate
    val scored = Curation.filterQuality(Curation.score(docs, col("text")), cfg.minQuality)
    val rep = CorpusOps.repetitionStats(docs, "doc_id", "text")
      .filter(col("top_frac") <= cfg.maxTopFrac && col("dup2_frac") <= cfg.maxDup2Frac)
      .select(col("doc_id"))
    val gated = scored.join(rep, Seq("doc_id"))

    // 2. exact dedup
    val exactDeduped = Curation.dedupKeepFirst(gated, col("text"), col("doc_id"))

    // 3. near-dup groups -> canonical doc per group
    val pairs = Dedup.minhashNearDups(exactDeduped, "doc_id", "text",
      threshold = cfg.nearDupThreshold)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val canonical = exactDeduped
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .filter(col("comp").isNull || col("comp") === col("doc_id"))
      .drop("comp")

    // 4. split
    val split = TrainingOps.assignSplit(canonical, col("doc_id"),
      cfg.trainPct, cfg.valPct)

    // 5. decontamination: drop leaking train docs
    val leaks = TrainingOps.decontaminate(split, "doc_id", "text",
        n = cfg.decontShingle, minShared = 1,
        trainPct = cfg.trainPct, valPct = cfg.valPct)
      .select(col("train_id").as("doc_id")).distinct()
    val clean = split.join(leaks, Seq("doc_id"), "left_anti")

    // 6. pack per (split, lang)
    val toks = clean.select(col("split"), col("lang"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    TrainingOps.packBinned(toks, struct(col("split"), col("lang")),
        col("doc_id"), col("n_tokens"), cfg.packCapacity)
      .select(col("split"), col("lang"), col("bin"), col("doc_id"), col("n_tokens"))
  }

  /** Land the shards: one parquet table partitioned by (split, lang) —
    * the read patterns that matter prune at directory level ("the
    * train/en shard" opens only train/en files) — with rows of a
    * (split, lang) partition clustered by (bin, doc_id) via a
    * repartition on the partition keys + in-partition sort, so a bin is
    * a contiguous run inside its files and a sequential shard reader
    * streams bins in order. Returns the landed root. */
  def writeShards(docs: DataFrame, manifest: DataFrame, path: String): String = {
    // an inner join would silently drop manifest rows whose text is
    // missing from `docs` (stale/filtered re-read) — fail loudly instead
    val missing = manifest.join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
    require(missing == 0,
      s"$missing manifest rows have no document in `docs` — stale or filtered input?")
    manifest.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("bin"), col("doc_id"))
      .write.mode("overwrite").partitionBy("split", "lang").parquet(path)
    path
  }

  /** §2.5 capstone — the manifest over `documents` (rows-only: every
    * stage is individually oracle- or spec-verified; the composition is
    * pinned by TrainingPipelineSpec's invariants instead). */
  def trainingPipelineQ(s: SparkSession, d: String): DataFrame =
    run(Tables.documents(s, d))
      .orderBy(col("split"), col("lang"), col("bin"), col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_training_pipeline" -> (trainingPipelineQ _),
  )
}
