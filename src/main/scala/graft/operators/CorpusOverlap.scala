package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.KmvLong
import graft.plans.PolyHash64
import graft.sources.Tables

/** Corpus-overlap set algebra on KMV sketches (SURVEY.md §2 row 255)
  * — the deterministic, REPLAYABLE complement to the HLL registers
  * (row 143): bottom-k signatures of the content-hash domain support
  * union / intersection / Jaccard estimates BETWEEN snapshot sketches
  * without re-reading either corpus — the "how much of corpus B is
  * already in corpus A" question a mixture planner asks before paying
  * for a cross-corpus dedup pass (row 79 answers it only by running
  * that pass; row 144's snapshot diff answers it only for same-id
  * docs). Estimators (Beyer et al., SIGMOD 2007):
  *
  *  - union sketch  = bottom-k of the merged sketches (closed: the
  *    sketch of A∪B, exactly);
  *  - Jaccard       ≈ |{h ∈ U_k : h ∈ A_k ∧ h ∈ B_k}| / |U_k|;
  *  - EXACT when the union sketch is unsaturated (|U_k| < k ⟺ both
  *    corpora fit entirely, every hash is present — spec-pinned);
  *  - distinct-count estimate (k−1)·2⁶⁴/h_k from the saturated
  *    sketch's k-th hash — a display DOUBLE, so it lives in the spec;
  *    the registered row carries only the integer image (sizes,
  *    k-th hash, intersection count, floor-div Jaccard ppm).
  *
  * Scale shape (100 TB): [[KmvLong]] IS the distinct — no distinct
  * shuffle, no sort; each corpus pays one map-side-combined k-bounded
  * aggregation (≤ k longs per map task on the wire), the algebra runs
  * on a 1×1 join of two k-arrays. Everything integer; the hash is
  * [[PolyHash64]] so the oracle re-derives the sketches in HUGEINT.
  */
object CorpusOverlap {

  val DefaultK = 128

  /** The bottom-k distinct sketch of a long column, as EXACTLY one
    * array row — a GLOBAL typed aggregation, so an empty corpus
    * yields an empty-array row (not an empty frame): the overlap
    * report below stays one-row for any input, matching its oracle's
    * scalar subqueries. */
  def kmvSketch(df: DataFrame, hCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new KmvLong(k).toColumn
    df.select(col(hCol)).as[Long]
      .select(agg.name("sk"))
      .toDF("sk")
  }

  /** One-row overlap report between two hash frames. */
  def overlap(a: DataFrame, b: DataFrame, hCol: String,
              k: Int = DefaultK): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sa = kmvSketch(a, hCol, k).select(col("sk").as("sa"))
    val sb = kmvSketch(b, hCol, k).select(col("sk").as("sb"))
    val withU = sa.crossJoin(sb) // 1x1
      .withColumn("__u",
        slice(array_sort(array_distinct(concat(col("sa"), col("sb")))), 1, k))
    withU.select(
        lit(k.toLong).as("k"),
        size(col("sa")).cast(LongType).as("n_a"),
        size(col("sb")).cast(LongType).as("n_b"),
        size(col("__u")).cast(LongType).as("union_k"),
        when(size(col("__u")) === k, element_at(col("__u"), k)).as("kth_hash"),
        size(filter(col("__u"), x =>
          array_contains(col("sa"), x) && array_contains(col("sb"), x)))
          .cast(LongType).as("inter_in_k"))
      .select(col("k"), col("n_a"), col("n_b"), col("union_k"),
        col("kth_hash"), col("inter_in_k"),
        // exact ⟺ unsaturated union (both corpora fit entirely)
        when(col("union_k") < col("k"), col("union_k")).as("union_exact"),
        when(col("union_k") < col("k"), col("inter_in_k")).as("inter_exact"),
        when(col("union_k") > 0L,
          GraphOps.fdiv(col("inter_in_k") * 1000000L, col("union_k")))
          .as("jaccard_ppm"))
  }

  /** §2 row 255 — overlap of two seeded snapshot corpora: A = docs
    * with even id, B = docs with id ≡ 0 (mod 3); elements are
    * content hashes ('kmv|' + text), so cross-corpus DUPLICATE texts
    * intersect beyond the shared id range. */
  def corpusOverlapQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        PolyHash64.poly_hash64(concat(lit("kmv|"), col("text"))).as("h"))
    overlap(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      "h", DefaultK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_overlap" -> (corpusOverlapQ _))

  val oracles: Map[String, String] = Map(
    // sketches re-derived in HUGEINT over the text hashes (the
    // q_dedup_simhash byte-fold replay + its ASCII guard), bottom-k
    // via ORDER BY h LIMIT k, the algebra as plain set SQL
    "q_corpus_overlap" -> {
      val k = DefaultK
      s"""WITH guard AS (
         |  SELECT CASE WHEN count(*) > 0 THEN error(
         |      'q_corpus_overlap oracle requires a pure-ASCII corpus')
         |    ELSE 0 END AS ok
         |  FROM documents WHERE octet_length(encode(text)) <> length(text)),
         |elems AS (
         |  SELECT corpus, t FROM (
         |    SELECT DISTINCT 'A' AS corpus, 'kmv|' || text AS t
         |    FROM documents WHERE doc_id % 2 = 0
         |    UNION
         |    SELECT DISTINCT 'B' AS corpus, 'kmv|' || text AS t
         |    FROM documents WHERE doc_id % 3 = 0)),
         |hs AS (${TrainingOps.polyHashOverSql("corpus",
                    "SELECT corpus, t FROM elems")}),
         |ska AS (SELECT DISTINCT h FROM hs WHERE corpus = 'A'
         |        ORDER BY h LIMIT $k),
         |skb AS (SELECT DISTINCT h FROM hs WHERE corpus = 'B'
         |        ORDER BY h LIMIT $k),
         |u AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
         |      ORDER BY h LIMIT $k),
         |st AS (
         |  SELECT CAST($k AS BIGINT) AS k,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ska) AS n_a,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM skb) AS n_b,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS union_k,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u
         |     WHERE h IN (SELECT h FROM ska)
         |       AND h IN (SELECT h FROM skb)) AS inter_in_k)
         |SELECT k, n_a, n_b, union_k,
         |  CASE WHEN union_k = k THEN (SELECT MAX(h) FROM u) END AS kth_hash,
         |  inter_in_k,
         |  CASE WHEN union_k < k THEN union_k END AS union_exact,
         |  CASE WHEN union_k < k THEN inter_in_k END AS inter_exact,
         |  CASE WHEN union_k > 0 THEN
         |    CAST(inter_in_k * 1000000 // union_k AS BIGINT) END AS jaccard_ppm
         |FROM st CROSS JOIN guard WHERE guard.ok = 0""".stripMargin
    })
}
