package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** HTML→text extraction (SURVEY.md §2 row 231) — the per-document
  * markup gate that runs BEFORE every text operator in a web-crawl
  * pipeline (reference transform.py:38-52 plays this role for JSON;
  * nothing played it for markup). jusText-lite recipe:
  *
  *  1. drop `<head>`, `<script>`, `<style>`, comments WITH content;
  *  2. segment on block-level tags (`p div h1-6 nav ul ol li table
  *     tr td br section article header footer blockquote`);
  *  3. per block: strip inline tags, decode the core entities
  *     (`&lt; &gt; &quot; &#39; &nbsp;`, `&amp;` LAST so decoded
  *     ampersands cannot cascade), collapse whitespace;
  *  4. boilerplate rule: drop a block whose LINK text (chars inside
  *     `<a>…</a>`, measured on the raw block) exceeds
  *     `maxLinkDensityPct`% of its extracted text — navs, footers
  *     and link farms die here, headings and paragraphs survive.
  *
  * Scale shape (100 TB): steps 1–4 are pure per-row projections —
  * every regex is codegen'd, NOTHING shuffles until the per-document
  * reassembly, which is the dedupLines two-aggregation pattern
  * (posexplode → filter → groupBy doc with sort_array(collect_list)).
  * One shuffle total, keyed by doc_id; no window, no driver state.
  * Link density is cross-multiplied — no doubles in the gate.
  */
object Markup {

  private val blockTagRe =
    "(?i)</?(?:p|div|h[1-6]|nav|ul|ol|li|table|tr|td|br|section|article|header|footer|blockquote)\\b[^>]*>"

  /** Shared entity decode (tags must already be stripped). */
  private def decodeEntities(c: Column): Column = {
    val step = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }
    step
  }

  /** Extract readable text from an HTML column. Output one row per
    * input row: (doc_id, n_blocks, n_kept, text_extract) — n_blocks
    * counts non-empty blocks after extraction, n_kept those surviving
    * the link-density gate, text_extract joins kept blocks with \n in
    * document order. Documents whose every block is boilerplate
    * survive as ("", 0) rows via the document spine (presence is not
    * identity — the dedupLines rule). */
  def htmlToText(docs: DataFrame, idCol: String, htmlCol: String,
                 maxLinkDensityPct: Int = 50): DataFrame = {
    val pre = docs.select(col(idCol).cast(LongType).as("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col(htmlCol),
          "(?is)<head\\b[^>]*>.*?</head>", " "),
          "(?is)<script\\b[^>]*>.*?</script>", " "),
          "(?is)<style\\b[^>]*>.*?</style>", " "),
          "(?s)<!--.*?-->", " ").as("h"))
    val blocks = pre
      .select(col("doc_id"), posexplode(split(col("h"), blockTagRe)).as(Seq("pos", "b")))
      .withColumn("link_chars",
        length(array_join(regexp_extract_all(col("b"),
          lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)), "")).cast(LongType))
      .withColumn("txt",
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("b"), "<[^>]*>", "")),
          "\\s+", " ")))
      .filter(col("txt") =!= "")
      .withColumn("n_chars", length(col("txt")).cast(LongType))
      .withColumn("keep",
        col("link_chars") * 100 <= col("n_chars") * maxLinkDensityPct)
    val perDoc = blocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          filter(transform(sort_array(collect_list(
              struct(col("pos"), when(col("keep"), col("txt")).otherwise(lit("")).as("t")))),
            x => x.getField("t")), x => x =!= ""), "\n").as("text_extract"))
    docs.select(col(idCol).cast(LongType).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_extract"), lit("")).as("text_extract"))
  }

  /** Registered query: deterministic synthetic HTML built from the
    * documents table IN BOTH ENGINES (the truecase damage-seeding
    * precedent) — head with title/style, a body script with a `<`
    * inside (lazy-match trap), a nav and a link-heavy footer (the
    * boilerplate the gate must drop), a heading and a paragraph
    * carrying the corpus text behind entity escapes (the content it
    * must keep and decode). */
  def htmlExtractQ(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/d\">Docs</a> <a href=\"/m\">More</a></nav>" +
        "<h1>Doc "), col("doc_id").cast("string"),
      lit("</h1><script>if (2 < 3) { nav(); }</script>" +
        "<style>.f { color: blue; }</style>" +
        "<p>A &quot;sample&quot; &lt;page&gt; &amp; text: "), col("text"),
      lit("</p><!-- hidden < comment -->" +
        "<div><a href=\"/tos\">Terms</a> &amp; <a href=\"/priv\">Privacy</a></div>" +
        "</body></html>"))
    htmlToText(Tables.documents(s, dir).select(col("doc_id"), html.as("html")),
        "doc_id", "html")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (htmlExtractQ _))

  val oracles: Map[String, String] = Map(
    // same synthesis, same strip/segment/decode/gate pipeline on
    // DuckDB's RE2 (inline (?is) flags, lazy quantifiers and
    // string_split_regex all verified); parallel unnest carries block
    // order, link chars measured on the raw block (COALESCE: DuckDB's
    // array_to_string([]) is NULL, Spark's array_join([]) is ''), the
    // density gate cross-multiplied — identical to the engine
    "q_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title></head><body>'
        |    || '<nav><a href="/">Home</a> <a href="/d">Docs</a> <a href="/m">More</a></nav>'
        |    || '<h1>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</h1><script>if (2 < 3) { nav(); }</script>'
        |    || '<style>.f { color: blue; }</style>'
        |    || '<p>A &quot;sample&quot; &lt;page&gt; &amp; text: ' || text
        |    || '</p><!-- hidden < comment -->'
        |    || '<div><a href="/tos">Terms</a> &amp; <a href="/priv">Privacy</a></div>'
        |    || '</body></html>' AS html
        |  FROM documents),
        |pre AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<head\b[^>]*>.*?</head>', ' ', 'g'),
        |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g') AS h
        |  FROM h),
        |blk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(h, '(?i)</?(p|div|h[1-6]|nav|ul|ol|li|table|tr|td|br|section|article|header|footer|blockquote)\b[^>]*>')) AS b,
        |    unnest(generate_series(1, len(string_split_regex(h, '(?i)</?(p|div|h[1-6]|nav|ul|ol|li|table|tr|td|br|section|article|header|footer|blockquote)\b[^>]*>')))) AS pos
        |  FROM pre),
        |ex AS (
        |  SELECT doc_id, pos,
        |    CAST(COALESCE(length(array_to_string(regexp_extract_all(b, '(?is)<a\b[^>]*>(.*?)</a>', 1), '')), 0) AS BIGINT) AS link_chars,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(b, '<[^>]*>', '', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS txt
        |  FROM blk),
        |nb AS (
        |  SELECT doc_id, pos, txt,
        |    CAST(length(txt) AS BIGINT) AS n_chars, link_chars,
        |    link_chars * 100 <= CAST(length(txt) AS BIGINT) * 50 AS keep
        |  FROM ex WHERE txt <> ''),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    COALESCE(string_agg(CASE WHEN keep THEN txt END, chr(10) ORDER BY pos), '') AS text_extract
        |  FROM nb GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_blocks, 0) AS n_blocks,
        |  COALESCE(a.n_kept, 0) AS n_kept,
        |  COALESCE(a.text_extract, '') AS text_extract
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin)
}
