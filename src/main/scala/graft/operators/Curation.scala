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
    "q_curation" -> (curateQ _),
  )

  val oracles: Map[String, String] = Map(
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
