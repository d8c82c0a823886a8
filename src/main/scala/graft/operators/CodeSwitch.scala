package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Code-switch span segmentation (SURVEY.md §2 row 188) — per-document
  * language RUNS: row 42's langid labels a whole document, but crawl
  * documents mix languages (quoted passages, boilerplate in the site
  * language, comment sections) and a mixed doc poisons whichever
  * monolingual bucket wins the doc-level vote. Segmenting into
  * fixed-size token blocks, labeling each block with the SAME
  * marker-count argmax as row 42, and merging adjacent same-language
  * blocks yields the spans a pipeline routes separately (or drops the
  * minority spans of). Span count per doc is the code-switching
  * signal itself.
  *
  * Block labeling is exact set membership: the row-42 marker regexes
  * are single whole words, so on the tokenized stream "marker count"
  * is `token IN (markers)` — pure integer votes, the identical
  * en ≥ es ≥ de ≥ fr tie order. A block with no markers votes all
  * zeros and labels "en" by that order (the doc-level rule's
  * behavior, kept deliberately).
  *
  * Scale shape: one posexplode, ONE per-doc window pair (lag + running
  * sum SHARE the frame — doc-bounded partitions, the span-corruption
  * posture), and two map-side-combined aggregations (block votes,
  * span assembly). No corpus-wide state. */
object CodeSwitch {

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "les", "des", "et", "dans"))

  /** (doc_id, span_id, lang, start_block, end_block, n_blocks) — the
    * merged same-language runs of `blockLen`-token blocks. */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            blockLen: Int = 10): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    val tok = docs.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
          .as(Seq("pos", "tk")))
      .withColumn("blk", (col("pos") / blockLen).cast(LongType))
    val voteCols = Markers.map { case (l, ms) =>
      sum(when(col("tk").isInCollection(ms), 1L).otherwise(0L)).as(s"c_$l") }
    val votes = tok.groupBy(col("doc_id"), col("blk"))
      .agg(voteCols.head, voteCols.tail: _*)
    val Seq(en, es, de, fr) = Markers.map(m => col(s"c_${m._1}"))
    val labeled = votes.withColumn("lang",
      when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("blk"))
    labeled
      .withColumn("brk",
        when(lag(col("lang"), 1).over(w).isNull ||
          lag(col("lang"), 1).over(w) =!= col("lang"), 1L).otherwise(0L))
      .withColumn("span_id", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("lang")).as("lang"), // constant within the span
        min(col("blk")).as("start_block"), max(col("blk")).as("end_block"),
        count(lit(1)).as("n_blocks"))
      .select(col("doc_id"), col("span_id"), col("lang"),
        col("start_block"), col("end_block"), col("n_blocks"))
  }

  /** Registered query: a Spanish tail is appended to every third doc
    * IN BOTH ENGINES (the truecase seeding precedent), so real
    * en→es switches exist and the merge/boundary logic is exercised
    * beyond the single-span common case. */
  def spansQ(s: SparkSession, d: String): DataFrame = {
    val seeded = Tables.documents(s, d)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" "),
            lit(("el la que de en y " * 5).trim)))
          .otherwise(col("text")).as("text"))
    spans(seeded, "doc_id", "text", blockLen = 10)
      .orderBy(col("doc_id"), col("span_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_code_switch" -> (spansQ _))

  val oracles: Map[String, String] = Map(
    // same seeding, positional blocks, IN-list votes, the row-42 tie
    // order, lag/cumsum run numbering, span assembly
    "q_code_switch" -> {
      def inList(l: String) =
        Markers.toMap.apply(l).map(m => s"'$m'").mkString(", ")
      s"""WITH seeded AS (SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0
         |         THEN text || ' ' || trim(repeat('el la que de en y ', 5))
         |         ELSE text END AS text
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos, l[i + 1] AS tk,
         |    CAST(i // 10 AS BIGINT) AS blk
         |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS l
         |        FROM seeded) t,
         |    LATERAL (SELECT unnest(range(0, len(l))) AS i) _i),
         |votes AS (
         |  SELECT doc_id, blk,
         |    SUM(CASE WHEN tk IN (${inList("en")}) THEN 1 ELSE 0 END) AS c_en,
         |    SUM(CASE WHEN tk IN (${inList("es")}) THEN 1 ELSE 0 END) AS c_es,
         |    SUM(CASE WHEN tk IN (${inList("de")}) THEN 1 ELSE 0 END) AS c_de,
         |    SUM(CASE WHEN tk IN (${inList("fr")}) THEN 1 ELSE 0 END) AS c_fr
         |  FROM tok GROUP BY 1, 2),
         |lb AS (
         |  SELECT doc_id, blk,
         |    CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
         |         WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
         |         WHEN c_de >= c_fr THEN 'de'
         |         ELSE 'fr' END AS lang
         |  FROM votes),
         |rn AS (
         |  SELECT *, CASE WHEN LAG(lang) OVER (PARTITION BY doc_id ORDER BY blk)
         |                   IS DISTINCT FROM lang THEN 1 ELSE 0 END AS brk
         |  FROM lb),
         |sp AS (
         |  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY blk) AS span_id
         |  FROM rn)
         |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id, MIN(lang) AS lang,
         |  MIN(blk) AS start_block, MAX(blk) AS end_block,
         |  CAST(COUNT(*) AS BIGINT) AS n_blocks
         |FROM sp
         |GROUP BY doc_id, span_id
         |ORDER BY doc_id, span_id""".stripMargin
    })
}
