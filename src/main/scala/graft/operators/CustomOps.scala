package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{SmallestK, TextFunctions}
import graft.plans.RollingMinHash.rolling_min_hash
import graft.plans.SpaceSavingTopK.topk_freq
import graft.sources.Tables

/** Queries backed by graft's custom Catalyst pieces (SURVEY.md §4:
  * preference (b) — native Expression; typed Aggregator). */
object CustomOps {

  /** Native rolling-minhash fingerprint per document (rows-only oracle —
    * the hash is graft-specific; the spec pins it against a driver-side
    * reference implementation and the interpreted eval path). */
  def rollingFingerprintQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        rolling_min_hash(col("text"), 8).as("fp"))
      .orderBy(col("doc_id"))

  /** Deterministic min-wise sample: the 3 docs with smallest md5(text)
    * per language, via the map-side-combinable SmallestK aggregator
    * (shuffle carries <= 3 rows per group per map task — the window
    * formulation the oracle uses would sort the whole corpus). */
  def samplePerGroupQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new SmallestK(3).toColumn
    val sampled = Tables.documents(s, d)
      .select(col("lang"), md5(col("text")).as("h"), col("doc_id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("ids"))
    sampled.toDF("lang", "ids")
      .select(col("lang"), posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Top-10 tokens per language via the SpaceSaving sketch. Capacity
    * (100k) far exceeds the corpus vocabulary, so the sketch is exact
    * here and the oracle can pin it with the window formulation; at
    * 100 TB the same plan runs with bounded memory where the exact
    * formulation shuffles every distinct token. */
  def topTokensQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(topk_freq(col("tok"), 10, 100000).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "tc")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rn"),
        col("tc.item").as("token"), col("tc.cnt").as("cnt"))
      .orderBy(col("lang"), col("rn"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_fingerprint" -> (rollingFingerprintQ _),
    "q_sample_per_group"    -> (samplePerGroupQ _),
    "q_top_tokens"          -> (topTokensQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_sample_per_group" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,

    "q_top_tokens" ->
      """SELECT lang, rn, token, cnt FROM (
        |  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS BIGINT) AS rn
        |  FROM (SELECT lang, UNNEST(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS token
        |        FROM documents) t
        |  GROUP BY lang, token) g
        |WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,
  )
}
