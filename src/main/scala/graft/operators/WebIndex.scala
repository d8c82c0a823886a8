package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions
import graft.sources.{Tables, Warc}

/** Web-index capstone (SURVEY.md §2 row 280) — the INDEX-side twin of
  * the row-264 crawl cycle: one program from raw per-host WARC
  * archives to the per-page index rows a search/curation system
  * stores, every stage an already-audited operator joined by equi-keys:
  *
  *   archives (254) → record carve → HTML→text gate (231) + link
  *   extraction (239) + URL canon (232) → anchor aggregation (266)
  *   → SURT-keyed index rows (265): per page, its own text signals
  *   (token count, langid) plus what the WEB says about it (inlinks,
  *   distinct linkers, mode anchor).
  *
  * The seeds make pages link to OTHER PAGES (targets doc_id%7 and
  * (doc_id+3)%9, resolved to the target's own host), so anchor
  * signals attach to real indexed pages — most pages have none (the
  * LEFT JOIN's NULL branch), nine accumulate thousands of competing
  * anchors (the mode + tie-break branch). Scale shape: the capstone
  * adds only url-keyed joins between stages; the one sort is the
  * terminal SURT total order, a real index build's final write. */
object WebIndex {

  private val CRLF = "\r\n"

  def webIndexQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tgt = docs.select(col("doc_id").as("tid"), lower(col("source")).as("tsrc"))
    val seeds = docs
      .withColumn("t1", pmod(col("doc_id"), lit(7)))
      .withColumn("t2", pmod(col("doc_id") + 3, lit(9)))
      .join(tgt.select(col("tid").as("t1"), col("tsrc").as("src1")), Seq("t1"))
      .join(tgt.select(col("tid").as("t2"), col("tsrc").as("src2")), Seq("t2"))
    def uri(id: org.apache.spark.sql.Column, src: org.apache.spark.sql.Column) =
      concat(lit("https://www."), src, lit(".com/p/"), id.cast("string"))
    val a1 = when(pmod(col("doc_id"), lit(3)) === 0, "Docs Home")
      .when(pmod(col("doc_id"), lit(3)) === 1, "docs").otherwise("Guide")
    val a2 = when(pmod(col("doc_id") + 1, lit(3)) === 0, "Docs Home")
      .when(pmod(col("doc_id") + 1, lit(3)) === 1, "docs").otherwise("Guide")
    val html = concat(lit("<html><body><p>"), col("text"),
      lit("</p><a href=\""), uri(col("t1"), col("src1")), lit("\">"), a1,
      lit("</a> <a href=\""), uri(col("t2"), col("src2")), lit("\">"), a2,
      lit("</a></body></html>"))
    val myUri = uri(col("doc_id"), lower(col("source")))
    val rec = concat(lit("WARC/1.0" + CRLF + "WARC-Type: resource" + CRLF +
        "WARC-Target-URI: "), myUri,
      lit(CRLF + "Content-Length: "), length(html).cast("string"),
      lit(CRLF + CRLF), html, lit(CRLF + CRLF))
    val files = seeds
      .select(concat(lit("www."), lower(col("source")), lit(".com.warc")).as("file"),
        col("doc_id"), rec.as("rec"))
      .groupBy(col("file"))
      .agg(concat(
        lit("WARC/1.0" + CRLF + "WARC-Type: warcinfo" + CRLF +
          "Content-Length: 0" + CRLF + CRLF + CRLF + CRLF),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "")).as("warc"))
    val recs = Warc.records(files, "file", "warc")
      .filter(col("rec_type") === "resource")
      .select(regexp_extract(col("uri"), "/p/([0-9]+)", 1).cast(LongType).as("doc_id"),
        col("uri"), col("body"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // two consumers (text gate + link extraction) of an expensive
    // carve — persist so the archives parse once
    val gate = Markup.htmlToText(
      recs.select(col("doc_id"), col("body")), "doc_id", "body")
    val pages = recs.select(col("doc_id"), Urls.canonicalUrl(col("uri")).as("url_canon"))
      .join(gate.select(col("doc_id"), col("text_extract")), Seq("doc_id"))
      .select(col("doc_id"), col("url_canon"),
        TextFunctions.tokenCount(col("text_extract")).as("n_tokens"),
        TextFunctions.langId(col("text_extract")).as("predicted_lang"))
    val links = Markup.extractLinks(
      recs.select(col("doc_id"), col("body"), col("uri")), "doc_id", "body", col("uri"))
    val anchors = WebIr.anchorAggregate(links, "url_canon", "anchor", "doc_id")
    pages.join(anchors, pages("url_canon") === anchors("url"), "left")
      .select(Urls.surtKey(pages("url_canon")).as("surt"), pages("url_canon"),
        col("n_tokens"), col("predicted_lang"),
        coalesce(col("n_inlinks"), lit(0L)).as("n_inlinks"),
        coalesce(col("n_src_docs"), lit(0L)).as("n_src_docs"),
        col("top_anchor"))
      .orderBy(col("surt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_web_index" -> (webIndexQ _))

  val oracles: Map[String, String] = Map(
    // seeds rebuilt verbatim (archive parse is round-trip identity,
    // the q_warc_extract posture); page text through the SHARED
    // htmlGatePipelineCtes, links through the SHARED linkExtractCtes
    // + canonSql, anchors through the q_anchor_text group-bys, surt
    // through the shared surtSql. The page's own uri is constructed
    // canonical (lowercase host, no port/params), so url_canon = base
    // verbatim.
    "q_web_index" ->
      ("""WITH tgt AS (SELECT doc_id AS tid, lower(source) AS tsrc FROM documents),
         |h AS (
         |  SELECT d.doc_id,
         |    'https://www.' || lower(d.source) || '.com/p/' || CAST(d.doc_id AS VARCHAR) AS base,
         |    '<html><body><p>' || d.text || '</p><a href="https://www.' || s1.tsrc ||
         |      '.com/p/' || CAST(d.doc_id % 7 AS VARCHAR) || '">' ||
         |      (CASE WHEN d.doc_id % 3 = 0 THEN 'Docs Home'
         |            WHEN d.doc_id % 3 = 1 THEN 'docs' ELSE 'Guide' END) ||
         |      '</a> <a href="https://www.' || s2.tsrc ||
         |      '.com/p/' || CAST((d.doc_id + 3) % 9 AS VARCHAR) || '">' ||
         |      (CASE WHEN (d.doc_id + 1) % 3 = 0 THEN 'Docs Home'
         |            WHEN (d.doc_id + 1) % 3 = 1 THEN 'docs' ELSE 'Guide' END) ||
         |      '</a></body></html>' AS html
         |  FROM documents d
         |  JOIN tgt s1 ON d.doc_id % 7 = s1.tid
         |  JOIN tgt s2 ON (d.doc_id + 3) % 9 = s2.tid),
         |""".stripMargin
        + Markup.htmlGatePipelineCtes("h") + ",\n"
        + Markup.linkExtractCtes("h") + ",\n"
        + Urls.canonSql("lnk", Seq("doc_id", "pos")) + ",\n"
        + s"""ledges AS (
         |  SELECT c.url_canon, c.doc_id, l.anchor
         |  FROM canonized c JOIN lnk l ON c.doc_id = l.doc_id AND c.pos = l.pos),
         |tot AS (
         |  SELECT url_canon, COUNT(*) AS n_inlinks,
         |    COUNT(DISTINCT doc_id) AS n_src_docs
         |  FROM ledges GROUP BY url_canon),
         |pa AS (SELECT url_canon, anchor, COUNT(*) AS cnt FROM ledges GROUP BY 1, 2),
         |topa AS (
         |  SELECT url_canon, anchor AS top_anchor FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY url_canon
         |      ORDER BY cnt DESC, anchor ASC) AS rn
         |    FROM pa) t
         |  WHERE rn = 1),
         |lg AS (
         |  SELECT h.doc_id, h.base AS url_canon, a.text_extract,
         |    len(regexp_extract_all(lower(a.text_extract), '\\b(the|and|of|to|a|in)\\b', 0)) AS c_en,
         |    len(regexp_extract_all(lower(a.text_extract), '\\b(el|la|de|que|y|en)\\b', 0)) AS c_es,
         |    len(regexp_extract_all(lower(a.text_extract), '\\b(der|die|und|ist|das)\\b', 0)) AS c_de,
         |    len(regexp_extract_all(lower(a.text_extract), '\\b(le|les|des|et|dans)\\b', 0)) AS c_fr
         |  FROM h JOIN agg a ON h.doc_id = a.doc_id),
         |pg AS (
         |  SELECT doc_id, url_canon,
         |    CAST(len(regexp_extract_all(text_extract, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens,
         |    CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
         |         WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
         |         WHEN c_de >= c_fr THEN 'de'
         |         ELSE 'fr' END AS predicted_lang
         |  FROM lg)
         |SELECT ${Urls.surtSql("p.url_canon")} AS surt, p.url_canon,
         |  p.n_tokens, p.predicted_lang,
         |  CAST(COALESCE(t.n_inlinks, 0) AS BIGINT) AS n_inlinks,
         |  CAST(COALESCE(t.n_src_docs, 0) AS BIGINT) AS n_src_docs,
         |  tp.top_anchor
         |FROM pg p
         |LEFT JOIN tot t ON p.url_canon = t.url_canon
         |LEFT JOIN topa tp ON p.url_canon = tp.url_canon
         |ORDER BY surt""".stripMargin))
}
