package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic, resumable sampling for training-data curation.
  *
  * `sample()` and Bernoulli samplers are non-reproducible across
  * retries/partitionings; a content-hash threshold is the pipeline-
  * grade alternative: the SAME rows are kept on every run, on any
  * cluster, with no shuffle (pure per-row predicate, pushdown-friendly).
  * The hash is md5-hex compared against a hex-prefix threshold —
  * portable across engines (identical md5 text in Spark and DuckDB), so
  * the sample itself is oracle-checkable.
  */
object Sampling {

  /** Keep rows whose md5(key) hex is lexicographically below
    * `hexThreshold` — e.g. "3" keeps ~3/16 ≈ 18.75%. */
  def hashSample(df: DataFrame, key: Column, hexThreshold: String): DataFrame =
    df.filter(md5(key.cast("string")) < hexThreshold)

  /** Per-stratum thresholds: stratum → hex threshold; strata not in the
    * map are dropped. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           thresholds: Map[String, String]): DataFrame = {
    val cond = thresholds.foldLeft(lit(false)) { case (acc, (s, t)) =>
      acc || (stratum === s && md5(key.cast("string")) < t)
    }
    df.filter(cond)
  }

  /** q_stratified_sample — 50% of English docs, ~19% of the rest
    * (per-stratum deterministic rates on the documents corpus). */
  def stratifiedSampleQ(s: SparkSession, d: String): DataFrame =
    stratifiedHashSample(Tables.documents(s, d), col("doc_id"), col("lang"),
        Map("en" -> "8", "es" -> "3", "de" -> "3", "fr" -> "3"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stratified_sample" -> (stratifiedSampleQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_stratified_sample" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE (lang = 'en' AND md5(CAST(doc_id AS VARCHAR)) < '8')
        |   OR (lang IN ('es', 'de', 'fr') AND md5(CAST(doc_id AS VARCHAR)) < '3')
        |ORDER BY doc_id""".stripMargin,
  )
}
