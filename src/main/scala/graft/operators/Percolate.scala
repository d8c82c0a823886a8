package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Stored-query percolation (SURVEY.md §2 row 183) — reverse search:
  * instead of a query scanning an index of documents, a corpus of
  * STORED queries scans each arriving document (Elasticsearch's
  * percolator, the alerting/routing primitive: "notify me when a doc
  * mentions X and Y but not Z"). Each stored query is a boolean
  * must/must-not term set; a document matches iff it contains EVERY
  * must term and NO must-not term. The ingest-side classifier a
  * curation pipeline uses to route documents to interested consumers
  * without running |queries| separate scans.
  *
  * Algorithm — the phrase-search vote pattern on sets: distinct
  * (doc, token) rows join the must-term table; a (query, doc) group
  * collecting all n_must votes is a candidate (distinctness makes
  * count(*) count distinct matched terms); must-not hits veto by
  * anti-join. Matching cost is independent of the number of stored
  * queries a token does NOT appear in.
  *
  * Scale shape: the query-term frames are constant-size broadcasts, so
  * non-query tokens drop MAP-SIDE before any shuffle; the vote
  * aggregation is map-side combinable; the veto is one anti-join on
  * (query, doc) ids. One distinct pass over the corpus, no windows,
  * no per-query scans. */
object Percolate {

  private val TokenPattern = "[a-z0-9]+"

  /** Fixed stored-query workload — constants over the corpus
    * vocabulary (the Bm25Queries precedent). */
  private[graft] val Stored: Seq[(Long, Seq[String], Seq[String])] = Seq(
    (1L, Seq("table", "scan"), Seq("slow")),
    (2L, Seq("customer", "value"), Seq.empty),
    (3L, Seq("spark"), Seq("batch", "stream")))

  /** (query_id, doc_id) for every stored query each document
    * satisfies. */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                stored: Seq[(Long, Seq[String], Seq[String])]): DataFrame = {
    require(stored.nonEmpty && stored.forall(_._2.nonEmpty),
      "percolate: every stored query needs at least one must term")
    val spark = docs.sparkSession
    import spark.implicits._
    val must = stored.flatMap { case (qid, m, _) =>
      m.distinct.map(t => (qid, t, m.distinct.length.toLong)) }
      .toDF("query_id", "term", "n_must")
    val mustNot = stored.flatMap { case (qid, _, n) =>
      n.distinct.map(t => (qid, t)) }.toDF("query_id", "term")
    val dt = docs.select(col(idCol).cast(LongType).as("doc_id"),
        explode(regexp_extract_all(lower(col(textCol)), lit(TokenPattern), lit(0)))
          .as("term"))
      .distinct()
    val cand = dt.join(broadcast(must), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"), col("n_must"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") === col("n_must"))
      .select(col("query_id"), col("doc_id"))
    val veto = dt.join(broadcast(mustNot), Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
    cand.join(veto, Seq("query_id", "doc_id"), "left_anti")
  }

  /** §2 row 183 — the fixed stored queries over documents. */
  def percolateQ(s: SparkSession, d: String): DataFrame =
    percolate(Tables.documents(s, d), "doc_id", "text", Stored)
      .orderBy(col("query_id"), col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_percolate" -> (percolateQ _))

  val oracles: Map[String, String] = Map(
    // same vote/veto construction over literal VALUES query tables
    "q_percolate" -> {
      val mRows = Stored.flatMap { case (qid, m, _) =>
        m.distinct.map(t => s"($qid, '$t', ${m.distinct.length})") }
        .mkString(", ")
      val nRows = Stored.flatMap { case (qid, _, n) =>
        n.distinct.map(t => s"($qid, '$t')") }.mkString(", ")
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term
         |    FROM documents) u),
         |m(query_id, term, n_must) AS (VALUES $mRows),
         |nn(query_id, term) AS (VALUES $nRows),
         |cand AS (
         |  SELECT m.query_id, dt.doc_id
         |  FROM dt JOIN m ON dt.term = m.term
         |  GROUP BY m.query_id, dt.doc_id, m.n_must
         |  HAVING COUNT(*) = m.n_must),
         |veto AS (
         |  SELECT DISTINCT nn.query_id, dt.doc_id
         |  FROM dt JOIN nn ON dt.term = nn.term)
         |SELECT CAST(c.query_id AS BIGINT) AS query_id, c.doc_id
         |FROM cand c LEFT JOIN veto v
         |  ON c.query_id = v.query_id AND c.doc_id = v.doc_id
         |WHERE v.query_id IS NULL
         |ORDER BY c.query_id, c.doc_id""".stripMargin
    })
}
