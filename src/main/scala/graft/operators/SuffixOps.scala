package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.plans.LcpLen
import graft.sources.Tables

/** Longest duplicated substring via suffix order (SURVEY.md §2 row
  * 256) — the UNBOUNDED-length complement to the fixed-n dup-span
  * cascade (row 104 / SubstringDedup): Lee et al.'s "Deduplicating
  * Training Data Makes Language Models Better" (2022) finds maximal
  * repeats with a suffix array; the classical identity is that the
  * longest substring occurring twice equals the maximum LCP of two
  * ADJACENT suffixes in sorted suffix order. This operator computes
  * exactly that, bounded at `maxLen` chars (the "is anything repeated
  * longer than L?" audit question; L defaults to 64, double the
  * cascade's top gram):
  *
  *  1. one row per (doc, pos) with the suffix capped at `maxLen`;
  *  2. suffixes sorted WITHIN 8-char-prefix buckets (two capped
  *     suffixes in different buckets differ inside their first 8
  *     chars, so any pair with LCP ≥ 8 is bucket-local — the global
  *     adjacency and the bucket adjacency agree on every pair that
  *     can matter, which is why results are filtered to len ≥ 8);
  *  3. adjacent-pair LCP via the codegen'd [[LcpLen]] expression;
  *  4. top-k by (len DESC, dup, doc, pos) — TakeOrderedAndProject.
  *
  * Scale shape (100 TB): the position frame is corpus-CHAR-sized, so
  * nothing global ever runs on it — the sort/lag window partitions by
  * the 8-char prefix bucket (the dup-span gram-bucket posture; a
  * pathological single-prefix corpus concentrates one bucket, the
  * documented skew bound), LCP is one fused per-row expression, and
  * the only driver-bound data is the k-row result. Memory per task is
  * bounded by `maxLen` per row, not document size, because the
  * suffix keys are capped BEFORE the shuffle. */
object SuffixOps {

  val BucketChars = 8

  /** Adjacent-suffix duplicate spans of length ≥ [[BucketChars]],
    * capped at `maxLen`: (len, dup, doc_a, pos_a, doc_b, pos_b) for
    * the top `k` pairs. Positions are 1-based; (doc_a, pos_a) is the
    * window-order predecessor. */
  def longestDupSpans(docs: DataFrame, idCol: String, textCol: String,
                      maxLen: Int = 64, k: Int = 5): DataFrame = {
    require(maxLen > BucketChars, s"maxLen must exceed $BucketChars, got $maxLen")
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // Spread the TEXT rows before the per-character explode: the
    // position frame is corpus-CHAR-sized and its substring/bucket
    // projection is the operator's map-heavy half — a narrow input
    // layout (single-row-group parquet = one scan task) would run it
    // serially. Shuffling the un-exploded text is ~maxLen times
    // cheaper than the suffix frame the window exchange moves anyway.
    val keyed = docs
      .select(col(idCol).cast(LongType).as("doc_id"), col(textCol).as("__t"))
      .filter(length(col("__t")) > 0)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("__t")))).as("p0"), col("__t"))
      .select(col("doc_id"), col("p0").cast(LongType).as("pos"),
        col("__t").substr(col("p0"), lit(maxLen)).as("suf"))
      .withColumn("__b", col("suf").substr(1, BucketChars))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("suf"), col("doc_id"), col("pos"))
    keyed
      .withColumn("psuf", lag(col("suf"), 1).over(w))
      .withColumn("pdoc", lag(col("doc_id"), 1).over(w))
      .withColumn("ppos", lag(col("pos"), 1).over(w))
      .filter(col("psuf").isNotNull)
      .withColumn("len", LcpLen.lcp_len(col("suf"), col("psuf")))
      .filter(col("len") >= BucketChars)
      .select(col("len"), col("suf").substr(lit(1), col("len").cast("int")).as("dup"),
        col("pdoc").as("doc_a"), col("ppos").as("pos_a"),
        col("doc_id").as("doc_b"), col("pos").as("pos_b"))
      .orderBy(col("len").desc, col("dup"), col("doc_a"), col("pos_a"),
        col("doc_b"), col("pos_b"))
      .limit(k)
  }

  /** §2 row 256 — top-5 longest duplicate spans (≤ 64 chars) of the
    * documents corpus; the corpus's seeded duplicate/near-duplicate
    * documents guarantee long repeats, so the len-≥-8 floor is far
    * from binding. */
  def longestDupQ(s: SparkSession, d: String): DataFrame =
    longestDupSpans(Tables.documents(s, d), "doc_id", "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_longest_dup" -> (longestDupQ _))

  val oracles: Map[String, String] = Map(
    // the GLOBAL suffix order (single-node DuckDB needs no bucket
    // decomposition) — identical pair set at len >= 8 because every
    // such pair shares its 8-char-prefix bucket; LCP via the maximal
    // k with equal prefixes
    "q_longest_dup" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
        |    substr(text, CAST(i + 1 AS INT), 64) AS suf
        |  FROM documents,
        |    LATERAL (SELECT unnest(range(0, length(text))) AS i) _i),
        |adj AS (
        |  SELECT doc_id, pos, suf,
        |    LAG(suf)    OVER (ORDER BY suf, doc_id, pos) AS psuf,
        |    LAG(doc_id) OVER (ORDER BY suf, doc_id, pos) AS pdoc,
        |    LAG(pos)    OVER (ORDER BY suf, doc_id, pos) AS ppos
        |  FROM pos),
        |lc AS (
        |  SELECT doc_id, pos, suf, pdoc, ppos,
        |    CAST(list_max(list_filter(range(0, least(length(suf), length(psuf)) + 1),
        |      k -> substr(suf, 1, CAST(k AS INT)) = substr(psuf, 1, CAST(k AS INT))))
        |      AS BIGINT) AS len
        |  FROM adj WHERE psuf IS NOT NULL)
        |SELECT len, substr(suf, 1, CAST(len AS INT)) AS dup,
        |  pdoc AS doc_a, ppos AS pos_a, doc_id AS doc_b, pos AS pos_b
        |FROM lc WHERE len >= 8
        |ORDER BY len DESC, dup, doc_a, pos_a, doc_b, pos_b
        |LIMIT 5""".stripMargin)
}
