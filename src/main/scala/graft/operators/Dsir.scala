package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.plans.PolyHash64
import graft.sources.Tables

/** Hashed n-gram importance resampling (DSIR-style, cf. Xie et al.
  * 2023 "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus document by how much its hashed unigram+bigram
  * feature distribution looks like a TARGET domain's, then keep the
  * top-k — the standard "select pretraining data that resembles the
  * high-quality target" pass.
  *
  * Cross-engine exactness without ln(): instead of the paper's summed
  * log-likelihood ratios (transcendental — the q_unigram_logprob
  * lesson), each feature bucket carries the Laplace-smoothed probability
  * RATIO in fixed point,
  *   λ_b = (SCALE · (tc_b+1) · (TR+B)) div ((rc_b+1) · (TT+B)),
  * rational in the counts, products widened to decimal(38,0) (the chi²
  * posture: long×long×SCALE ≤ ~1e32 < 1e38 at any corpus size) and
  * floor-divided with IntegralDivide — every engine computes the same
  * integer. A document's affinity is the SUM of λ over its feature
  * OCCURRENCES (repeats kept): order-independent, exactly replayable.
  * Monotonicity in the target-likeness of each bucket is what selection
  * needs; the log is a monotone reparametrization per-feature, and the
  * spec pins that target-phrase documents outrank off-domain ones.
  *
  * Scale shape (100 TB): the model is ONE corpus aggregation — features
  * hash into a FIXED bucket space (2^k rows), so the count table is
  * bounded and BROADCASTS regardless of corpus size; the target is a
  * boolean flag column, so raw and target distributions come out of the
  * same grouped aggregate (no second scan for the model). Scoring is
  * the only other pass: explode → broadcast λ join → one (id, partial
  * sum) shuffle with map-side combine. Selection is top-k by
  * (score, id) — TakeOrderedAndProject, never a global sort.
  *
  * Overflow contract: λ_b < 2^63 requires SCALE · p̂_t(b)/p̂_r(b)
  * < 2^63 — with SCALE=1e6 that admits probability ratios up to ~9e12,
  * far past any real corpus skew; per-doc sums need features·λ < 2^63.
  */
object Dsir {

  val Buckets = 256        // registered-query feature space
  val Scale = 1000000L     // fixed-point resolution of the ratio

  /** Feature bucket of a shingle string: domain-prefixed poly-hash into
    * `[0, buckets)` (the row-123 hash-stream-independence posture). */
  def bucketOf(sh: Column, buckets: Int): Column =
    pmod(PolyHash64.poly_hash64(concat(lit("dsir|"), sh)), lit(buckets.toLong))

  /** One row per feature OCCURRENCE: unigrams + bigrams of the
    * normalized words, with the carry columns preserved. */
  def featureRows(docs: DataFrame, carry: Seq[Column], textCol: Column): DataFrame = {
    val uni = docs.select(carry :+ explode(TextFunctions.words(textCol)).as("sh"): _*)
    val bi = TextFunctions.shingleRows(docs, carry, textCol, n = 2)
    uni.unionByName(bi)
  }

  /** Per-document affinity scores: (id, score). `isTarget` marks the
    * target-domain rows of the SAME corpus frame (DSIR's raw
    * distribution is the corpus being scored). */
  def affinityScores(docs: DataFrame, idCol: Column, textCol: Column,
                     isTarget: Column, buckets: Int = Buckets,
                     scale: Long = Scale): DataFrame = {
    require(buckets > 0 && scale > 0, "buckets and scale must be positive")
    val D = DecimalType(20, 0)
    val feats = featureRows(
      docs.select(idCol.as("__id"), textCol.as("__text"), isTarget.as("__tgt")),
      Seq(col("__id"), col("__tgt")), col("__text"))
      .withColumn("__b", bucketOf(col("sh"), buckets))
    // the model: ONE aggregation over the hashed space — bounded rows
    val counts = feats.groupBy(col("__b")).agg(
      count(lit(1)).as("__rc"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"))
    val totals = counts.agg(
      sum(col("__rc")).as("__TR"), sum(col("__tc")).as("__TT"))
    val lam = counts.crossJoin(broadcast(totals))
      .withColumn("__lam", call_function("div",
        (col("__tc") + 1).cast(D) * (col("__TR") + buckets).cast(D) * lit(scale).cast(D),
        (col("__rc") + 1).cast(D) * (col("__TT") + buckets).cast(D)))
      .select(col("__b"), col("__lam"))
    feats.join(broadcast(lam), "__b")
      .groupBy(col("__id"))
      .agg(sum(col("__lam")).as("score"))
      .select(col("__id").as("id"), col("score"))
  }

  /** Top-k most target-like documents by (score desc, id) —
    * TakeOrderedAndProject, no corpus-scale sort. */
  def importanceSelect(docs: DataFrame, idCol: Column, textCol: Column,
                       isTarget: Column, k: Int,
                       buckets: Int = Buckets, scale: Long = Scale): DataFrame =
    affinityScores(docs, idCol, textCol, isTarget, buckets, scale)
      .orderBy(col("score").desc, col("id"))
      .limit(k)

  // ---- Registered query ----------------------------------------------------

  /** §2.11 — top-64 docs most like the `src0` target domain. */
  def dsirSelectQ(s: SparkSession, d: String): DataFrame =
    importanceSelect(Tables.documents(s, d), col("doc_id"), col("text"),
        col("source") === "src0", k = 64)
      .withColumnRenamed("id", "doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsir_select" -> (dsirSelectQ _),
  )

  val oracles: Map[String, String] = Map(
    // unigram+bigram features, poly-hash buckets (HUGEINT replay of the
    // domain-prefixed hash over the DISTINCT feature vocabulary), one
    // joint count table, fixed-point λ with HUGEINT floor-div, per-doc
    // occurrence sums, top-64
    "q_dsir_select" ->
      s"""WITH w AS (SELECT doc_id, source,
         |        regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS ws
         |      FROM documents),
         |feats AS (
         |  SELECT doc_id, source, unnest(ws) AS sh FROM w
         |  UNION ALL
         |  SELECT doc_id, source,
         |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS sh
         |  FROM w),
         |hs AS (${TrainingOps.polyHashSql("dsir|", "(SELECT DISTINCT sh FROM feats)", "sh")}),
         |bmap AS (SELECT sh, ((h % $Buckets) + $Buckets) % $Buckets AS b FROM hs),
         |fb AS (SELECT f.doc_id, f.source, m.b FROM feats f JOIN bmap m ON f.sh = m.sh),
         |counts AS (
         |  SELECT b, count(*) AS rc,
         |         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tc
         |  FROM fb GROUP BY b),
         |tot AS (SELECT sum(rc) AS tr, sum(tc) AS tt FROM counts),
         |lam AS (
         |  SELECT c.b,
         |    (CAST(c.tc + 1 AS HUGEINT) * CAST(tot.tr + $Buckets AS HUGEINT) * $Scale)
         |      // (CAST(c.rc + 1 AS HUGEINT) * CAST(tot.tt + $Buckets AS HUGEINT)) AS lam
         |  FROM counts c, tot),
         |sc AS (
         |  SELECT f.doc_id, CAST(sum(l.lam) AS BIGINT) AS score
         |  FROM fb f JOIN lam l ON f.b = l.b GROUP BY f.doc_id)
         |SELECT doc_id, score FROM sc
         |ORDER BY score DESC, doc_id LIMIT 64""".stripMargin,
  )
}
