package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Hybrid retrieval fusion — reciprocal rank fusion (RRF, Cormack et
  * al. 2009) over any number of rankers, the standard way modern
  * search stacks combine BM25's lexical ranking with embedding-kNN's
  * semantic one: each ranker contributes 1/(K + rank) per (query,
  * doc), fused score is the sum, K=60 the canonical damping.
  *
  * Cross-engine exactness: the contribution is the fixed-point image
  * SCALE div (K + rank) — rank is an integer, so the image is pure
  * integer floor-division and the fused SUM is order-independent (the
  * BM25 integer-score-image trick applied one level up, to rank
  * aggregation). No doubles anywhere in the fusion itself.
  *
  * Scale shape: fusion consumes RANKINGS, not corpora — each input is
  * already top-k-per-query bounded, so the union, the (qid, doc)
  * aggregate and the final per-query window all run on frames of at
  * most |queries|·Σk rows. The expensive work stays inside the
  * rankers, which keep their own scale paths (BM25 rides the persisted
  * postings index, dense retrieval the IVF/PQ buckets).
  */
object Fusion {

  val RrfK = 60L
  val Scale = 1000000L

  /** Fuse rankings — each (qid, doc_id, rn) with rn starting at 1 —
    * into top-`topK` per query by (rrf desc, doc_id). */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int,
              rrfK: Long = RrfK, scale: Long = Scale): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(topK > 0 && rrfK >= 0 && scale > 0, "bad fusion params")
    val contrib = rankings.map(_.select(col("qid"), col("doc_id"),
        call_function("div", lit(scale), lit(rrfK) + col("rn")).as("__c")))
      .reduce(_ unionByName _)
    contrib.groupBy(col("qid"), col("doc_id")).agg(sum(col("__c")).as("rrf"))
      // per-query frame is bounded by Σ ranker depths, never corpus-sized
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id")))
        .cast(LongType))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("doc_id"), col("rrf"), col("rn"))
  }

  /** The registered pair of rankers: BM25 top-10 and exact-cosine
    * top-10 for the same query ids (the embeddings table is id-aligned
    * with documents, so vec_id q doubles as query q's dense
    * representation). Shared by the fusion and agreement queries. */
  private def rankerPair(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val sparse = TextOps2.bm25Q(s, d)
      .select(col("qid"), col("doc_id"), col("rn"))
    val e = Tables.embeddings(s, d)
    val qids = TextOps2.Bm25Queries.map(_._1)
    val dense = VectorOps.bruteForceTopK(
        e, e.filter(col("vec_id").isin(qids: _*)), "vec_id", "embedding", k = 10)
      .select(col("qid"), col("cid").as("doc_id"), col("rn"))
    (sparse, dense)
  }

  /** §2.11 — BM25 fused with dense retrieval by RRF. */
  def hybridRankQ(s: SparkSession, d: String): DataFrame = {
    val (sparse, dense) = rankerPair(s, d)
    rrfFuse(Seq(sparse, dense), topK = 10)
      .orderBy(col("qid"), col("rn"))
  }

  /** Kendall pair agreement between two rankers (SURVEY.md §2 row
    * 148) — the diagnostic that decides whether fusing them is worth
    * anything: high agreement means the second ranker adds mostly
    * cost; low agreement (with comparable quality) is where RRF
    * shines. Per query, over the docs BOTH rankers returned:
    * concordant/discordant pair counts — the integer numerators of
    * Kendall's τ ((C−D) / (n(n−1)/2)); the counts stay on the oracle
    * wire, the ratio is the caller's one division. Queries whose lists
    * share < 2 docs report zero pairs; ROW_NUMBER rankings have no
    * rank ties, so every common pair is either C or D.
    *
    * Scale shape: rankings are top-k-per-query bounded, so the join
    * and the within-query pair frame are |queries|·k and |queries|·k²
    * — never corpus-sized. */
  def rankAgreement(ra: DataFrame, rb: DataFrame): DataFrame = {
    val common = ra.select(col("qid"), col("doc_id"), col("rn").as("__ra"))
      .join(rb.select(col("qid"), col("doc_id"), col("rn").as("__rb")),
        Seq("qid", "doc_id"))
    // every query either ranker saw reports a row — a zero-overlap
    // query (n_common = 0) is the diagnostic's loudest signal, not a
    // row to drop
    val qs = ra.select(col("qid")).unionByName(rb.select(col("qid"))).distinct()
    val nc = qs.join(
      common.groupBy(col("qid")).agg(count(lit(1)).as("__nc")), Seq("qid"), "left")
      .select(col("qid"), coalesce(col("__nc"), lit(0L)).as("n_common"))
    val p1 = common.select(col("qid"), col("doc_id").as("__d1"),
      col("__ra").as("__ra1"), col("__rb").as("__rb1"))
    val p2 = common.select(col("qid"), col("doc_id").as("__d2"),
      col("__ra").as("__ra2"), col("__rb").as("__rb2"))
    val pairs = p1.join(p2, Seq("qid")).filter(col("__d1") < col("__d2"))
      .select(col("qid"),
        ((col("__ra1") - col("__ra2")) * (col("__rb1") - col("__rb2"))).as("__p"))
      .groupBy(col("qid"))
      .agg(sum(when(col("__p") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("__p") < 0, 1L).otherwise(0L)).as("discordant"))
    nc.join(pairs, Seq("qid"), "left")
      .select(col("qid"), col("n_common"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"))
  }

  /** §2.12 — agreement between the BM25 and dense top-10 lists. */
  def rankAgreementQ(s: SparkSession, d: String): DataFrame = {
    val (sparse, dense) = rankerPair(s, d)
    rankAgreement(sparse, dense).orderBy(col("qid"))
  }

  /** Integer weight table for depth-truncated, renormalized RBO at
    * persistence p = 9/10: per depth d, w_d = 9^(d-1)·(lcm(1..D)/d)·
    * 10^(D-d) — the exact numerators of (1-p)p^(d-1)/d over the common
    * denominator — exposed as (suffixWeights S(m) = Σ_{d≥m} w_d,
    * den = Σ_d w_d·d, so two identical depth-D lists score exactly 1).
    * Computed ONCE here and injected as literals into BOTH engines'
    * plans (the retrievalEval discount-table pattern). */
  private[graft] def rboWeights(depth: Int): (Seq[Long], Long) = {
    require(depth >= 1 && depth <= 12, s"depth must be in [1,12], got $depth")
    val lcm = (1 to depth).map(BigInt(_)).reduce((a, b) => a * b / a.gcd(b))
    val w = (1 to depth).map(d =>
      BigInt(9).pow(d - 1) * (lcm / d) * BigInt(10).pow(depth - d))
    val suffix = (1 to depth).map(m => w.drop(m - 1).sum)
    val den = w.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    require(den.isValidLong && suffix.head.isValidLong,
      s"RBO weights overflow a long at depth $depth")
    (suffix.map(_.toLong), den.toLong)
  }

  /** §2 row 308 — rank-biased overlap (Webber, Moffat & Zobel 2010):
    * the TOP-WEIGHTED ranking similarity the Kendall diagnostic (row
    * 148) is not — Kendall weighs a swap at ranks 1↔2 like one at
    * 9↔10 and only sees the docs BOTH rankers returned, while RBO@D =
    * Σ_d (1-p)p^(d-1)·|A_d ∩ B_d|/d rewards agreement at the TOP and
    * handles non-conjoint lists natively (the search-eval contract:
    * two rankers disagreeing about rank 47 don't matter; rank 1 does).
    * Truncated at D and renormalized so identical lists score 1.
    *
    * Exact integer image via the suffix-weight collapse: a common doc
    * at ranks (ra, rb) is inside both prefixes for every d ≥
    * max(ra, rb), so its total contribution is S(max(ra, rb)) =
    * Σ_{d≥max} w_d — per-doc ONE literal-array lookup, the whole
    * per-query score ONE integer sum (no per-depth loop, no pair
    * join). rbo = num/den in a single pinned division.
    *
    * Scale shape: one equi-join of the two rank frames on
    * (qid, doc_id), one map-side-combinable aggregate; the weight
    * table is a D-element literal. Queries either ranker saw report a
    * row (zero overlap = 0/den — the rankAgreement posture). */
  def rboOverlap(ra: DataFrame, rb: DataFrame, depth: Int = 8): DataFrame = {
    val (suffix, den) = rboWeights(depth)
    val sArr = array(suffix.map(lit): _*)
    val common = ra.filter(col("rn") <= depth)
      .select(col("qid"), col("doc_id"), col("rn").as("__ra"))
      .join(rb.filter(col("rn") <= depth)
        .select(col("qid"), col("doc_id"), col("rn").as("__rb")),
        Seq("qid", "doc_id"))
      .select(col("qid"), element_at(sArr,
        greatest(col("__ra"), col("__rb")).cast(IntegerType)).as("__w"))
    val qs = ra.select(col("qid")).unionByName(rb.select(col("qid"))).distinct()
    qs.join(common.groupBy(col("qid")).agg(sum(col("__w")).as("__n")),
        Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("__n"), lit(0L)).as("rbo_num"),
        lit(den).as("rbo_den"),
        (coalesce(col("__n"), lit(0L)).cast(DoubleType) /
          lit(den).cast(DoubleType)).as("rbo"))
  }

  /** §2 row 308 registered query — RBO@8 between the BM25 and dense
    * rankers (the pair rows 147/148 fuse and diagnose). */
  def rboQ(s: SparkSession, d: String): DataFrame = {
    val (sparse, dense) = rankerPair(s, d)
    rboOverlap(sparse, dense, depth = 8).orderBy(col("qid"))
  }

  // ---- Retrieval-quality evaluation (SURVEY.md §2 row 163) -------------

  /** Integer DCG discount image: w(i) = floor(Scale / log2(i+1)) for
    * ranks 1..k, computed ONCE here and injected as literals into BOTH
    * engines' plans — cross-engine exactness by construction (the BM25
    * integer-score-image trick applied to the discount table; no
    * engine ever evaluates a log). */
  private[graft] def dcgWeights(k: Int): IndexedSeq[Long] =
    (1 to k).map(i =>
      math.floor(Scale.toDouble / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Graded gain 2^rel − 1 for rel ∈ {0, 1, 2} as an explicit integer
    * map — no pow() in either engine. */
  private def gainOf(rel: Column): Column =
    when(rel === 2, 3L).when(rel === 1, 1L).otherwise(0L)

  private def weightOf(rn: Column, k: Int): Column =
    dcgWeights(k).zipWithIndex.foldLeft(lit(0L)) { case (acc, (wi, i)) =>
      when(rn === (i + 1).toLong, wi).otherwise(acc)
    }

  /** Per-query retrieval metrics of one `ranking` (qid, doc_id, rn with
    * rn starting at 1) against graded `qrels` (qid, doc_id, rel > 0):
    * the INTEGER cores of the standard IR metrics, so parity is
    * hash-exact and the caller does the one division each metric ends
    * with — `first_rel_rank` (MRR = avg 1/first_rel_rank; NULL when the
    * top-k has no relevant doc), `n_rel_at_k` / `n_rel_total`
    * (precision@k, recall@k), and `dcg` / `idcg` on the fixed-point
    * discount image (nDCG = dcg/idcg).
    *
    * Scale shape: both inputs are top-k-per-query bounded, so every
    * frame here is |queries|·k rows — the corpus-sized work stays inside
    * the rankers. The qrels spine (not the ranking) drives the output,
    * so a query the ranker returned nothing for still reports a row —
    * total retrieval failure is the eval's loudest signal. */
  def retrievalEval(ranking: DataFrame, qrels: DataFrame, k: Int,
                    ranker: String): DataFrame = {
    val hits = ranking.filter(col("rn") <= k)
      .join(qrels.select(col("qid"), col("doc_id"), col("rel")),
        Seq("qid", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perQ = hits.groupBy(col("qid")).agg(
      min(when(col("rel") > 0, col("rn"))).as("first_rel_rank"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel_at_k"),
      sum(gainOf(col("rel")) * weightOf(col("rn"), k)).as("dcg"))
    // ideal DCG: qrels sorted by grade (doc_id tiebreak — deterministic
    // even with equal grades), truncated at k
    val ideal = qrels
      .withColumn("irn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("doc_id")))
        .cast(LongType))
      .groupBy(col("qid")).agg(
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel_total"),
        sum(when(col("irn") <= k, gainOf(col("rel")) * weightOf(col("irn"), k))
          .otherwise(0L)).as("idcg"))
    ideal.join(perQ, Seq("qid"), "left")
      .select(lit(ranker).as("ranker"), col("qid"),
        col("first_rel_rank"),
        coalesce(col("n_rel_at_k"), lit(0L)).as("n_rel_at_k"),
        col("n_rel_total"),
        coalesce(col("dcg"), lit(0L)).as("dcg"),
        col("idcg"))
  }

  /** §2 row 163 — BM25 and the RRF fusion each scored against dense
    * pseudo-qrels (exact-cosine top-5: the self-match grades 2, ranks
    * 2–5 grade 1 — the standard distillation eval: how well does
    * lexical/fused retrieval recover the embedding ground truth). */
  def retrievalEvalQ(s: SparkSession, d: String): DataFrame = {
    val (sparse, dense) = rankerPair(s, d)
    val e = Tables.embeddings(s, d)
    val qids = TextOps2.Bm25Queries.map(_._1)
    val qrels = VectorOps.bruteForceTopK(
        e, e.filter(col("vec_id").isin(qids: _*)), "vec_id", "embedding", k = 5)
      .select(col("qid"), col("cid").as("doc_id"),
        when(col("rn") === 1, 2L).otherwise(1L).as("rel"))
    val fused = rrfFuse(Seq(sparse, dense), topK = 10)
      .select(col("qid"), col("doc_id"), col("rn"))
    retrievalEval(sparse, qrels, k = 10, ranker = "bm25")
      .unionByName(retrievalEval(fused, qrels, k = 10, ranker = "rrf"))
      .orderBy(col("ranker"), col("qid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rank"    -> (hybridRankQ _),
    "q_rank_agreement" -> (rankAgreementQ _),
    "q_rbo" -> (rboQ _),
    "q_retrieval_eval" -> (retrievalEvalQ _),
  )

  val oracles: Map[String, String] = Map(
    // both rankers replayed (BM25 CTEs shared with q_bm25; dense =
    // quantized-dot cosine over ALL candidates for qids 1..3), fused
    // on the integer 1e6 // (60 + rn) image
    "q_hybrid_rank" ->
      s"""WITH ${TextOps2.bm25RankCtes},
         |v AS (SELECT vec_id, embedding, ${VectorQueries.dotSql("embedding", "embedding")} AS nsq FROM embeddings),
         |qv AS (SELECT vec_id AS qid, embedding AS qe, nsq AS q_nsq FROM v WHERE vec_id IN (1, 2, 3)),
         |s2 AS (SELECT qid, c.vec_id AS cid,
         |         ${VectorQueries.dotSql("qe", "c.embedding")} / greatest(sqrt(q_nsq) * sqrt(c.nsq), 1e-9) AS cos
         |       FROM qv, v c),
         |densernk AS (
         |  SELECT qid, cid, rn FROM (
         |    SELECT qid, cid,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rn
         |    FROM s2) t
         |  WHERE rn <= 10),
         |contrib AS (
         |  SELECT qid, doc_id, 1000000 // (60 + rn) AS c FROM bm25rank
         |  UNION ALL
         |  SELECT qid, cid AS doc_id, 1000000 // (60 + rn) AS c FROM densernk),
         |fused AS (
         |  SELECT qid, doc_id, CAST(SUM(c) AS BIGINT) AS rrf
         |  FROM contrib GROUP BY qid, doc_id)
         |SELECT qid, doc_id, rrf, rn FROM (
         |  SELECT qid, doc_id, rrf,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rn
         |  FROM fused) t
         |WHERE rn <= 10
         |ORDER BY qid, rn""".stripMargin,

    // both rankers' CTEs shared verbatim with q_hybrid_rank; the
    // suffix-weight table is injected from the SAME Scala computation
    // as the engine's literals (the retrievalEval discount pattern)
    "q_rbo" -> {
      val (suffix, den) = rboWeights(8)
      val wvals = suffix.zipWithIndex
        .map { case (sw, i) => s"(${i + 1}, CAST($sw AS BIGINT))" }
        .mkString(", ")
      s"""WITH ${TextOps2.bm25RankCtes},
         |v AS (SELECT vec_id, embedding, ${VectorQueries.dotSql("embedding", "embedding")} AS nsq FROM embeddings),
         |qv AS (SELECT vec_id AS qid, embedding AS qe, nsq AS q_nsq FROM v WHERE vec_id IN (1, 2, 3)),
         |s2 AS (SELECT qid, c.vec_id AS cid,
         |         ${VectorQueries.dotSql("qe", "c.embedding")} / greatest(sqrt(q_nsq) * sqrt(c.nsq), 1e-9) AS cos
         |       FROM qv, v c),
         |densernk AS (
         |  SELECT qid, cid, rn FROM (
         |    SELECT qid, cid,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rn
         |    FROM s2) t
         |  WHERE rn <= 10),
         |sw(m, s) AS (VALUES $wvals),
         |common AS (
         |  SELECT a.qid, GREATEST(a.rn, b.rn) AS mx
         |  FROM bm25rank a JOIN densernk b
         |    ON a.qid = b.qid AND a.doc_id = b.cid
         |  WHERE a.rn <= 8 AND b.rn <= 8),
         |per AS (
         |  SELECT c.qid, CAST(SUM(sw.s) AS BIGINT) AS n
         |  FROM common c JOIN sw ON sw.m = c.mx
         |  GROUP BY 1),
         |qs AS (SELECT DISTINCT qid FROM (
         |  SELECT qid FROM bm25rank UNION ALL SELECT qid FROM densernk) u)
         |SELECT qs.qid, COALESCE(per.n, 0) AS rbo_num,
         |  CAST($den AS BIGINT) AS rbo_den,
         |  CAST(COALESCE(per.n, 0) AS DOUBLE) / CAST($den AS DOUBLE) AS rbo
         |FROM qs LEFT JOIN per ON per.qid = qs.qid
         |ORDER BY qs.qid""".stripMargin
    },

    // both rankers' CTEs shared verbatim with q_hybrid_rank, then the
    // integer pair-sign counts over the common docs
    "q_rank_agreement" ->
      s"""WITH ${TextOps2.bm25RankCtes},
         |v AS (SELECT vec_id, embedding, ${VectorQueries.dotSql("embedding", "embedding")} AS nsq FROM embeddings),
         |qv AS (SELECT vec_id AS qid, embedding AS qe, nsq AS q_nsq FROM v WHERE vec_id IN (1, 2, 3)),
         |s2 AS (SELECT qid, c.vec_id AS cid,
         |         ${VectorQueries.dotSql("qe", "c.embedding")} / greatest(sqrt(q_nsq) * sqrt(c.nsq), 1e-9) AS cos
         |       FROM qv, v c),
         |densernk AS (
         |  SELECT qid, cid, rn FROM (
         |    SELECT qid, cid,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rn
         |    FROM s2) t
         |  WHERE rn <= 10),
         |common AS (
         |  SELECT b.qid, b.doc_id, b.rn AS ra, dr.rn AS rb
         |  FROM bm25rank b JOIN densernk dr ON b.qid = dr.qid AND b.doc_id = dr.cid),
         |qs AS (SELECT DISTINCT qid FROM bm25rank UNION SELECT DISTINCT qid FROM densernk),
         |nc AS (
         |  SELECT qs.qid, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_common
         |  FROM qs LEFT JOIN (SELECT qid, COUNT(*) AS n FROM common GROUP BY qid) c
         |    ON qs.qid = c.qid),
         |pairs AS (
         |  SELECT a.qid, (a.ra - b.ra) * (a.rb - b.rb) AS p
         |  FROM common a JOIN common b ON a.qid = b.qid AND a.doc_id < b.doc_id),
         |ag AS (
         |  SELECT qid,
         |    CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         |    CAST(SUM(CASE WHEN p < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant
         |  FROM pairs GROUP BY qid)
         |SELECT nc.qid, nc.n_common,
         |  CAST(COALESCE(ag.concordant, 0) AS BIGINT) AS concordant,
         |  CAST(COALESCE(ag.discordant, 0) AS BIGINT) AS discordant
         |FROM nc LEFT JOIN ag ON nc.qid = ag.qid
         |ORDER BY nc.qid""".stripMargin,

    // both rankers' CTEs shared verbatim with q_hybrid_rank; qrels =
    // the dense top-5 (rank 1 grades 2, ranks 2-5 grade 1); the DCG
    // discount is the SAME floor(1e6/log2(i+1)) literal table the Scala
    // side bakes in — neither engine evaluates a log
    "q_retrieval_eval" -> {
      def wCase(rn: String): String =
        dcgWeights(10).zipWithIndex.map { case (w, i) =>
          s"WHEN $rn = ${i + 1} THEN $w" }
          .mkString("CASE ", " ", " ELSE 0 END")
      val gain = "CASE WHEN rel = 2 THEN 3 WHEN rel = 1 THEN 1 ELSE 0 END"
      s"""WITH ${TextOps2.bm25RankCtes},
         |v AS (SELECT vec_id, embedding, ${VectorQueries.dotSql("embedding", "embedding")} AS nsq FROM embeddings),
         |qv AS (SELECT vec_id AS qid, embedding AS qe, nsq AS q_nsq FROM v WHERE vec_id IN (1, 2, 3)),
         |s2 AS (SELECT qid, c.vec_id AS cid,
         |         ${VectorQueries.dotSql("qe", "c.embedding")} / greatest(sqrt(q_nsq) * sqrt(c.nsq), 1e-9) AS cos
         |       FROM qv, v c),
         |densernk AS (
         |  SELECT qid, cid, rn FROM (
         |    SELECT qid, cid,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rn
         |    FROM s2) t
         |  WHERE rn <= 10),
         |qrels AS (
         |  SELECT qid, cid AS doc_id, CASE WHEN rn = 1 THEN 2 ELSE 1 END AS rel
         |  FROM densernk WHERE rn <= 5),
         |contrib AS (
         |  SELECT qid, doc_id, 1000000 // (60 + rn) AS c FROM bm25rank
         |  UNION ALL
         |  SELECT qid, cid AS doc_id, 1000000 // (60 + rn) AS c FROM densernk),
         |fused AS (
         |  SELECT qid, doc_id, CAST(SUM(c) AS BIGINT) AS rrf
         |  FROM contrib GROUP BY qid, doc_id),
         |rrfrank AS (
         |  SELECT qid, doc_id, rn FROM (
         |    SELECT qid, doc_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rn
         |    FROM fused) t
         |  WHERE rn <= 10),
         |ranked AS (
         |  SELECT 'bm25' AS ranker, qid, doc_id, rn FROM bm25rank
         |  UNION ALL
         |  SELECT 'rrf' AS ranker, qid, doc_id, rn FROM rrfrank),
         |hits AS (
         |  SELECT r.ranker, r.qid, r.rn, COALESCE(q.rel, 0) AS rel
         |  FROM ranked r LEFT JOIN qrels q ON r.qid = q.qid AND r.doc_id = q.doc_id
         |  WHERE r.rn <= 10),
         |perq AS (
         |  SELECT ranker, qid,
         |    CAST(MIN(CASE WHEN rel > 0 THEN rn END) AS BIGINT) AS first_rel_rank,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
         |    CAST(SUM(($gain) * (${wCase("rn")})) AS BIGINT) AS dcg
         |  FROM hits GROUP BY ranker, qid),
         |ideal AS (
         |  SELECT qid,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_total,
         |    CAST(SUM(CASE WHEN irn <= 10 THEN ($gain) * (${wCase("irn")}) ELSE 0 END) AS BIGINT) AS idcg
         |  FROM (SELECT qid, rel,
         |          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS BIGINT) AS irn
         |        FROM qrels) t
         |  GROUP BY qid),
         |rankers(ranker) AS (VALUES ('bm25'), ('rrf'))
         |SELECT rk.ranker, i.qid, p.first_rel_rank,
         |  CAST(COALESCE(p.n_rel_at_k, 0) AS BIGINT) AS n_rel_at_k,
         |  i.n_rel_total,
         |  CAST(COALESCE(p.dcg, 0) AS BIGINT) AS dcg, i.idcg
         |FROM rankers rk CROSS JOIN ideal i
         |LEFT JOIN perq p ON p.ranker = rk.ranker AND p.qid = i.qid
         |ORDER BY rk.ranker, i.qid""".stripMargin
    },
  )
}
