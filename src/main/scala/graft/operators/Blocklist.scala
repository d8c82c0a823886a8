package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Blocklist (banned-phrase) filtering — the C4/Dolma-style content
  * gate: drop or flag documents containing any of N banned phrases
  * VERBATIM as a token sequence. Distinct from decontamination (row
  * 74: n-gram OVERLAP against an eval corpus) — here the unit is an
  * exact phrase from a curated list, matched at word boundaries after
  * normalization, with per-phrase occurrence counts for the audit
  * trail real filters must produce.
  *
  * Scale shape: the phrase list is curated and tiny — it BROADCASTS,
  * so no JOIN ever shuffles. Phrases are grouped by token length; for
  * each distinct length L the corpus's L-shingles equi-join the
  * length-L phrases. Cost per multi-word length is one shingleRows
  * pass, which carries that machinery's one sort-shuffle on the doc
  * key (shingleRows' documented cost); single-word phrases are a pure
  * explode with no shuffle. The per-doc summary aggregates (id,
  * phrase) hits with map-side combine.
  */
object Blocklist {

  /** Per-(doc, phrase) occurrence counts, one row per matched pair.
    * Multi-word phrases match across the normalized token stream;
    * empty/blank phrases are rejected. */
  def phraseHits(docs: DataFrame, idCol: Column, textCol: Column,
                 phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val normed = phrases.map(_.trim.toLowerCase.replaceAll("\\s+", " "))
    require(normed.forall(_.nonEmpty), "blocklist phrases must be non-blank")
    require(normed.distinct.size == normed.size, "duplicate blocklist phrases")
    val src = docs.select(idCol.as("id"), textCol.as("__text"))
    // an empty blocklist is the natural no-op: nothing flagged
    if (normed.isEmpty)
      return src.select(col("id"), lit("").as("phrase"), lit(0L).as("n_hits"))
        .limit(0)
    val byLen = normed.groupBy(_.split(" ").length)
    byLen.toSeq.sortBy(_._1).map { case (len, ps) =>
      val pdf = broadcast(ps.toDF("phrase"))
      val sh =
        if (len == 1) src.select(col("id"),
          explode(TextFunctions.words(col("__text"))).as("sh"))
        else TextFunctions.shingleRows(src, Seq(col("id")), col("__text"), n = len)
      sh.join(pdf, col("sh") === col("phrase"))
        .groupBy(col("id"), col("phrase"))
        .agg(count(lit(1)).as("n_hits"))
    }.reduce(_ unionByName _)
  }

  /** Documents with at least one banned phrase: (id, n_phrases,
    * n_hits) — the audit summary a filtering run reports. */
  def flagged(docs: DataFrame, idCol: Column, textCol: Column,
              phrases: Seq[String]): DataFrame =
    phraseHits(docs, idCol, textCol, phrases)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_phrases"), sum(col("n_hits")).as("n_hits"))

  /** The clean side: documents matching NO banned phrase (broadcast
    * anti-join on the flagged id set). */
  def blocklistFilter(docs: DataFrame, idCol: Column, textCol: Column,
                      phrases: Seq[String]): DataFrame =
    docs.join(flagged(docs, idCol, textCol, phrases)
        .select(col("id").as("__bad")),
      idCol === col("__bad"), "left_anti")

  // ---- Registered query ----------------------------------------------------

  /** Fixed audit workload: phrases over the synthetic vocabulary at
    * lengths 1..3 (constants — replayable by construction). */
  private[graft] val AuditPhrases = Seq(
    "slow merge",
    "customer order value",
    "spark")

  /** §2.11 — the audit summary over the corpus. */
  def blocklistQ(s: SparkSession, d: String): DataFrame =
    flagged(Tables.documents(s, d), col("doc_id"), col("text"), AuditPhrases)
      .select(col("id").as("doc_id"), col("n_phrases"), col("n_hits"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_blocklist" -> (blocklistQ _),
  )

  // The per-length CTEs and WHERE clauses are GENERATED from
  // AuditPhrases (normalized exactly as phraseHits normalizes), so
  // editing the phrase list cannot silently break oracle parity.
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def lenCte(len: Int): String =
    if (len == 1) s"g1 AS (SELECT doc_id, unnest(ws) AS sh FROM w)"
    else {
      val concat = (0 until len).map(o => s"ws[i+$o]").mkString(" || ' ' || ")
      s"g$len AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-${len - 2}),\n" +
        s"         i -> $concat)) AS sh FROM w)"
    }

  private def hitsArms: String = {
    val normed = AuditPhrases.map(_.trim.toLowerCase.replaceAll("\\s+", " "))
    normed.groupBy(_.split(" ").length).toSeq.sortBy(_._1).map { case (len, ps) =>
      s"  SELECT doc_id, sh AS phrase, count(*) AS n_hits FROM g$len\n" +
        s"  WHERE sh IN (${ps.sorted.map(sqlLit).mkString(", ")}) GROUP BY 1, 2"
    }.mkString("\n  UNION ALL\n")
  }

  private def lenCtes: String =
    AuditPhrases.map(_.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").length)
      .distinct.sorted.map(lenCte).mkString(",\n")

  val oracles: Map[String, String] = Map(
    // occurrence counts per (doc, phrase) via the positional n-gram
    // derivation at each phrase length, then the per-doc audit rollup
    "q_blocklist" ->
      s"""WITH w AS (SELECT doc_id,
         |        regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS ws
         |      FROM documents),
         |$lenCtes,
         |hits AS (
         |$hitsArms)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_phrases,
         |       CAST(sum(n_hits) AS BIGINT) AS n_hits
         |FROM hits GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
  )
}
