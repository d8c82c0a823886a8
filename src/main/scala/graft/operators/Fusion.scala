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

  /** §2.11 — BM25 top-10 fused with exact-cosine top-10 for the same
    * query ids (the embeddings table is id-aligned with documents, so
    * vec_id q doubles as query q's dense representation). */
  def hybridRankQ(s: SparkSession, d: String): DataFrame = {
    val sparse = TextOps2.bm25Q(s, d)
      .select(col("qid"), col("doc_id"), col("rn"))
    val e = Tables.embeddings(s, d)
    val qids = TextOps2.Bm25Queries.map(_._1)
    val dense = VectorOps.bruteForceTopK(
        e, e.filter(col("vec_id").isin(qids: _*)), "vec_id", "embedding", k = 10)
      .select(col("qid"), col("cid").as("doc_id"), col("rn"))
    rrfFuse(Seq(sparse, dense), topK = 10)
      .orderBy(col("qid"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rank" -> (hybridRankQ _),
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
  )
}
