package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rank"    -> (hybridRankQ _),
    "q_rank_agreement" -> (rankAgreementQ _),
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
  )
}
