package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Second text-analysis batch: TF-IDF term weighting and PII redaction
  * — corpus-statistics and scrubbing stages of a training-data
  * pipeline.
  */
object TextOps2 {

  /** ASCII word tokens, lowercased. Restricted to the regex subset with
    * identical semantics in Spark (Java regex) and DuckDB (RE2). */
  private val TokenPattern = "[a-z0-9]+"

  /** q_tfidf — top-3 terms per document by smoothed TF-IDF.
    *
    * Document frequency is aggregated from the TF rows and BROADCAST
    * back: the df table is |vocab| rows (bounded), the broadcast join
    * adds no shuffle of the TF rows, and partial aggregation shrinks
    * the df shuffle map-side — measured faster than a count-over-token
    * window, which re-shuffles every TF row without partial agg.
    * The score uses the rational form tf * (N+1)/(df+1) — a deliberate
    * variant of log TF-IDF chosen for exact cross-engine
    * representability (ln() is NOT guaranteed identical across libm
    * implementations). It is NOT order-equivalent to tf * log-idf:
    * e.g. (tf=1, ratio=100) vs (tf=10, ratio=2) rank differently under
    * the two forms. Parity holds because the oracle computes the
    * identical rational score. */
  def tfidfQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val tokens = docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit(TokenPattern), lit(0))).as("token"))
    val tf = tokens.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast(DoubleType) * (col("n_docs") + 1) / (col("df") + 1))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Email + phone scrubbing. Pattern subset chosen for identical
    * Java-regex/RE2 semantics: char classes, +/{m,}, no lookaround. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** q_redact — redacted length + change flag per doc (the corpus is
    * synthetic prose, so most rows are unchanged — the oracle still
    * pins the regex semantics end-to-end). */
  def redactQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(redact(col("text"))).cast(LongType).as("redacted_len"),
        (redact(col("text")) =!= col("text")).as("changed"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf"  -> (tfidfQ _),
    "q_redact" -> (redactQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_tfidf" ->
      """WITH tokens AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, token, tf, df, score, rn FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * (n.n_docs + 1) / (df.df + 1) AS score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf AS DOUBLE) * (n.n_docs + 1) / (df.df + 1) DESC,
        |               tf.token) AS BIGINT) AS rn
        |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n) t
        |WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    "q_redact" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') <> text AS changed
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
  )
}
