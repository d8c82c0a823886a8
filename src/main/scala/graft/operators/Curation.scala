package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** End-to-end corpus curation: score → filter → dedup → sample — the
  * composition a training-data pipeline actually runs (SURVEY.md §2.3),
  * built from the library's own combinators so each stage stays a
  * declarative plan stage.
  */
object Curation {

  /** Attach the quality score. */
  def score(df: DataFrame, textCol: Column): DataFrame =
    df.withColumn("quality", TextFunctions.qualityScore(textCol))

  /** Keep documents at or above the floor. */
  def filterQuality(df: DataFrame, minQuality: Double): DataFrame =
    df.filter(col("quality") >= minQuality)

  /** Normalized-hash dedup keeping the lowest id per group. Window over
    * the hash: high-cardinality partition key → one sort-shuffle, no
    * hot partitions. */
  def dedupKeepFirst(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(TextFunctions.normalize(textCol))).orderBy(idCol)
    df.withColumn("__dr", row_number().over(w))
      .filter(col("__dr") === 1).drop("__dr")
  }

  /** Deterministic min-wise sample of k docs per group (same semantics
    * as the SmallestK aggregator; window form used here because the
    * frame is already small post-filter). */
  def samplePerGroup(df: DataFrame, groupCol: Column, hashCol: Column,
                     idCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(hashCol, idCol)
    df.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
  }

  /** Per-group quality calibration: each doc's PERCENTILE rank of its
    * quality score within its group — raw scores are not comparable
    * across sources (a 0.7 from clean wiki prose and a 0.7 from forum
    * scrape mean different things), so per-source thresholds are set
    * on the calibrated rank, not the raw score (the standard
    * per-domain curation practice). Returns q_rank ∈ [0, 1]
    * (PERCENT_RANK semantics: (rank−1)/(n−1), 0 for a singleton
    * group).
    *
    * Rank order is (floor(score·1e9), id) — the integer score image
    * makes the order replayable AND bucketable: the same two-level
    * decomposition as [[CorpusOps.lengthStratifiedSample]], with score
    * buckets from the integer image's top bits (monotone, since the
    * image is non-negative). No window ever partitions by the group
    * alone over doc rows — a source holding half the corpus still
    * spreads over 2^bucketBits tasks. */
  def calibrateQuality(docs: DataFrame, grpCol: Column, scoreCol: Column,
                       idCol: Column, bucketBits: Int = 12): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    // adds q_rank, preserves every input column (the sibling-engine
    // convention: dunder internals never leak into the output)
    val aug = docs
      .withColumn("__qi", floor(scoreCol.cast(DoubleType) * 1e9).cast(LongType))
      .withColumn("__g", grpCol)
      // scores live in [0, 1] → the integer image fits 30 bits; its
      // top bits are a monotone range bucket of the rank order
      .withColumn("__b", shiftright(col("__qi"), 30 - bucketBits))
    val cells = aug.groupBy(col("__g").as("__cg"), col("__b").as("__cb"))
      .agg(count(lit(1)).as("__c"))
    val wb = Window.partitionBy(col("__cg")).orderBy(col("__cb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col("__cg"))
    val cum = cells
      .withColumn("__pre", coalesce(sum(col("__c")).over(wb), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wn))
    val wj = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(col("__qi"), idCol)
    aug.join(cum, col("__g") <=> col("__cg") && col("__b") === col("__cb"))
      .withColumn("__rank", col("__pre") + row_number().over(wj))
      .withColumn("q_rank",
        (col("__rank") - lit(1L)).cast(DoubleType) /
          greatest(col("__n") - lit(1L), lit(1L)).cast(DoubleType))
      .drop("__qi", "__g", "__b", "__cg", "__cb", "__c", "__pre", "__n", "__rank")
  }

  /** §2.5 — per-source calibrated quality over `documents`. */
  def calibrateQualityQ(s: SparkSession, d: String): DataFrame =
    calibrateQuality(
        score(Tables.documents(s, d), col("text"))
          .select(col("source"), col("doc_id"), col("quality")),
        col("source"), col("quality"), col("doc_id"))
      .select(col("source"), col("doc_id"), col("quality"), col("q_rank"))
      .orderBy(col("source"), col("doc_id"))

  /** The full pipeline over `documents`. */
  def curateQ(s: SparkSession, d: String): DataFrame = {
    val scored = score(Tables.documents(s, d), col("text"))
    val kept = filterQuality(scored, 0.55)
    val deduped = dedupKeepFirst(kept, col("text"), col("doc_id"))
    samplePerGroup(deduped, col("lang"), md5(col("text")), col("doc_id"), 3)
      .select(col("lang"), col("rn"), col("doc_id"), col("quality"))
      .orderBy(col("lang"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation"           -> (curateQ _),
    "q_quality_calibrated" -> (calibrateQualityQ _),
  )

  val oracles: Map[String, String] = Map(
    // the oracle replays the SINGLE-window per-source percent rank over
    // the integer score image; the engine's bucketed decomposition must
    // reproduce it bit-exactly (integer rank, then one double division)
    "q_quality_calibrated" ->
      """WITH q AS (
        |  SELECT source, doc_id,
        |    0.6 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
        |      + 0.4 * (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, quality,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY CAST(floor(quality * 1e9) AS BIGINT), doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM q)
        |SELECT source, doc_id, quality,
        |  CAST(rk - 1 AS DOUBLE) / greatest(n - 1, 1) AS q_rank
        |FROM r
        |ORDER BY source, doc_id""".stripMargin,

    "q_curation" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, text,
        |    0.6 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
        |      + 0.4 * (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality
        |  FROM documents),
        |kept AS (SELECT * FROM scored WHERE quality >= 0.55),
        |dedup AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS dr
        |    FROM kept) x
        |  WHERE dr = 1),
        |sampled AS (
        |  SELECT lang, doc_id, quality,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM dedup)
        |SELECT lang, rn, doc_id, quality
        |FROM sampled
        |WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,
  )
}
