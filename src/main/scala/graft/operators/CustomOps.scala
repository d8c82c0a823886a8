package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.SmallestK
import graft.plans.RollingMinHash.rolling_min_hash
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_fingerprint" -> (rollingFingerprintQ _),
    "q_sample_per_group"    -> (samplePerGroupQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_sample_per_group" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,
  )
}
