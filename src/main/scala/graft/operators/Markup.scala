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

  /** Link extraction (SURVEY.md §2 row 239) — the web-GRAPH front
    * gate next to [[htmlToText]]'s text gate: pull every `<a href>`
    * out of a page (scripts/styles/comments stripped FIRST so code-
    * embedded markup doesn't count), clean the anchor text (tag
    * strip + entity decode + collapse), resolve relative hrefs
    * against the page's base URL (absolute / root-relative /
    * path-relative), canonicalize ([[Urls.canonicalUrl]]) and key by
    * registered domain — the edge list PageRank (row 114), domain
    * mixture (row 99) and chi² (row 121) consume. Pure per-row
    * codegen'd projection; the only shuffle is the caller's sink. */
  def extractLinks(docs: DataFrame, idCol: String, htmlCol: String,
                   baseUrlCol: Column): DataFrame = {
    val pat = "(?is)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    val pre = docs.select(col(idCol).cast(LongType).as("doc_id"),
        baseUrlCol.as("base"),
        regexp_replace(regexp_replace(regexp_replace(col(htmlCol),
          "(?is)<script\\b[^>]*>.*?</script>", " "),
          "(?is)<style\\b[^>]*>.*?</style>", " "),
          "(?s)<!--.*?-->", " ").as("h"))
    val links = pre
      .withColumn("__hs", regexp_extract_all(col("h"), lit(pat), lit(1)))
      .withColumn("__as", regexp_extract_all(col("h"), lit(pat), lit(2)))
      .select(col("doc_id"), col("base"),
        posexplode(zip_with(col("__hs"), col("__as"),
          (h, a) => struct(h.as("href"), a.as("anchor")))).as(Seq("pos", "l")))
      .select(col("doc_id"), col("base"), col("pos").cast(LongType).as("pos"),
        col("l.href").as("href"),
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("l.anchor"), "<[^>]*>", "")),
          "\\s+", " ")).as("anchor"))
    val origin = regexp_extract(col("base"), "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath = regexp_extract(col("base"), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    val dir = when(baseDir === "", lit("/")).otherwise(baseDir)
    val abs = when(col("href").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), col("href"))
      .when(col("href").startsWith("/"), concat(origin, col("href")))
      .otherwise(concat(origin, dir, col("href")))
    links
      .withColumn("url_canon", Urls.canonicalUrl(abs))
      .withColumn("host", Urls.hostOf(abs))
      .withColumn("registered_domain", Urls.registeredDomain(col("host")))
      .withColumn("is_external", col("host") =!= Urls.hostOf(col("base")))
      .select(col("doc_id"), col("pos"), col("href"), col("anchor"),
        col("url_canon"), col("host"), col("registered_domain"),
        col("is_external"))
  }

  /** HTML table extraction (SURVEY.md §2 row 248) — the STRUCTURED
    * fourth front-gate view (text 231 / links 239 / metadata 245):
    * `<table>` → `<tr>` → `<th>/<td>` parsed into one row per CELL
    * with (table, row, col) coordinates and a header flag, cell text
    * cleaned (inner tags stripped, entities decoded, whitespace
    * collapsed). The shape a table-to-text linearizer or a
    * column-type profiler consumes. Three positional explosions, all
    * per-row column ops (regex groups zipped like extractLinks);
    * zero shuffles beyond the caller's sink. */
  def extractTables(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val tablePat = "(?is)<table\\b[^>]*>(.*?)</table>"
    val rowPat = "(?is)<tr\\b[^>]*>(.*?)</tr>"
    val cellPat = "(?is)<(t[hd])\\b[^>]*>(.*?)</t[hd]>"
    val tables = docs.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(regexp_extract_all(col(htmlCol), lit(tablePat), lit(1)))
          .as(Seq("table_idx", "t")))
    val rows = tables.select(col("doc_id"), col("table_idx").cast(LongType).as("table_idx"),
        posexplode(regexp_extract_all(col("t"), lit(rowPat), lit(1)))
          .as(Seq("row_idx", "r")))
    rows.select(col("doc_id"), col("table_idx"), col("row_idx").cast(LongType).as("row_idx"),
        posexplode(zip_with(
          regexp_extract_all(col("r"), lit(cellPat), lit(1)),
          regexp_extract_all(col("r"), lit(cellPat), lit(2)),
          (tag, c) => struct(tag.as("tag"), c.as("c")))).as(Seq("col_idx", "cell")))
      .select(col("doc_id"), col("table_idx"), col("row_idx"),
        col("col_idx").cast(LongType).as("col_idx"),
        (lower(col("cell.tag")) === "th").as("is_header"),
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("cell.c"), "<[^>]*>", "")),
          "\\s+", " ")).as("cell_text"))
  }

  /** JSON-LD extraction (SURVEY.md §2 row 251) — the STRUCTURED
    * metadata channel row 245's meta tags don't carry: script blocks
    * typed `application/ld+json` pulled per page and the core
    * schema.org fields (`@type`, name, headline, datePublished) read
    * with JSON-path extraction (`get_json_object` — bracket syntax
    * for the `@`-prefixed key), NULL-safe on absent fields and
    * malformed JSON. The reference's own transform layer is JSON
    * flattening (transform.py:38-52) — this is that idea pointed at
    * embedded page metadata. Per-row projection + one posexplode. */
  def extractJsonLd(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val blockPat =
      "(?is)<script\\b[^>]*type=\"application/ld\\+json\"[^>]*>(.*?)</script>"
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(regexp_extract_all(col(htmlCol), lit(blockPat), lit(1)))
          .as(Seq("block_idx", "j")))
      .select(col("doc_id"), col("block_idx").cast(LongType).as("block_idx"),
        get_json_object(col("j"), "$['@type']").as("ld_type"),
        get_json_object(col("j"), "$.name").as("name"),
        get_json_object(col("j"), "$.headline").as("headline"),
        get_json_object(col("j"), "$.datePublished").as("date_published"))
  }

  /** §2 row 251 — JSON-LD blocks over synthetic pages: an Article
    * block (headline + datePublished), a second Product block on
    * every 2nd page (name only), none on every 5th page. */
  def jsonLdQ(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val art = concat(
      lit("<script type=\"application/ld+json\">{\"@type\":\"Article\",\"headline\":\"Doc "),
      id, lit(" headline\",\"datePublished\":\"2025-01-"),
      lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
      lit("\"}</script>"))
    val prod = when(pmod(col("doc_id"), lit(2)) === 0, concat(
        lit("<script type=\"application/ld+json\">{\"@type\":\"Product\",\"name\":\"P"),
        id, lit("\"}</script>")))
      .otherwise(lit(""))
    val html = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")))
      .otherwise(concat(lit("<html><head>"), art, prod,
        lit("</head><body><script>var x = 1;</script><p>"), col("text"),
        lit("</p></body></html>")))
    extractJsonLd(Tables.documents(s, dir).select(col("doc_id"), html.as("html")),
        "doc_id", "html")
      .orderBy(col("doc_id"), col("block_idx"))
  }

  /** Table linearization (SURVEY.md §2 row 250) — the table-to-TEXT
    * transform pretraining pipelines run on [[extractTables]] output:
    * each data row serialized as "Header: value | Header: value" with
    * headers taken from row 0 when EVERY row-0 cell is a `<th>`
    * (otherwise positional `c<i>` names and row 0 stays data). One
    * (doc, table) header aggregate + one equi-join + the per-row
    * reassembly aggregation. */
  def linearizeTables(cells: DataFrame): DataFrame = {
    val keys = Seq("doc_id", "table_idx")
    val hh = cells.filter(col("row_idx") === 0L)
      .groupBy(keys.map(col): _*)
      .agg(min(when(col("is_header"), 1L).otherwise(0L)).as("__hh"))
    val withH = cells.join(hh, keys)
    val headers = withH.filter(col("row_idx") === 0L && col("__hh") === 1L)
      .select(col("doc_id"), col("table_idx"), col("col_idx"),
        col("cell_text").as("__hname"))
    withH.filter(col("row_idx") >= col("__hh"))
      .join(headers, keys :+ "col_idx", "left")
      .withColumn("__kv", concat(
        coalesce(col("__hname"), concat(lit("c"), col("col_idx"))),
        lit(": "), col("cell_text")))
      .groupBy(col("doc_id"), col("table_idx"), col("row_idx"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("col_idx"), col("__kv")))),
        x => x.getField("__kv")), " | ").as("row_text"))
  }

  /** §2 row 250 — linearized rows of the row-248 seeded tables. */
  def tableRowsQ(s: SparkSession, dir: String): DataFrame =
    linearizeTables(tablesQ(s, dir))
      .orderBy(col("doc_id"), col("table_idx"), col("row_idx"))

  /** §2 row 248 — cells of two seeded tables per doc: a 2×3 table
    * with a `<th>` header row, an entity cell and a nested inline
    * tag, plus a single-cell table; every 7th doc has no tables. */
  def tablesQ(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val html = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")))
      .otherwise(concat(
        lit("<html><body><table><tr><th>Name</th><th>Qty &amp; unit</th><th>Id</th></tr>" +
          "<tr><td>Part <b>alpha</b></td><td> 4 &lt;kg&gt; </td><td>"), id,
        lit("</td></tr></table><p>between</p>" +
          "<table id=\"x\"><tr><td>only "), id,
        lit("</td></tr></table></body></html>")))
    extractTables(Tables.documents(s, dir).select(col("doc_id"), html.as("html")),
        "doc_id", "html")
      .orderBy(col("doc_id"), col("table_idx"), col("row_idx"), col("col_idx"))
  }

  /** Page-metadata extraction (SURVEY.md §2 row 245) — the third
    * front-gate view next to text (231) and links (239): title, meta
    * description, og:title and the canonical link, each
    * ATTRIBUTE-ORDER tolerant (`name=… content=…` and `content=…
    * name=…` both occur in the wild — two regexes per field,
    * first-nonempty wins), entity-decoded and whitespace-collapsed;
    * the canonical URL additionally normalized via
    * [[Urls.canonicalUrl]]. First match wins per field (document
    * order — `regexp_extract` semantics in both engines). Pure
    * per-row codegen'd projection, zero shuffles. */
  def extractMeta(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    def clean(c: Column): Column =
      trim(regexp_replace(decodeEntities(c), "\\s+", " "))
    def firstNonEmpty(a: Column, b: Column): Column =
      when(a =!= "", a).otherwise(b)
    def attrPair(tag: String, keyAttr: String, keyVal: String,
                 valAttr: String): Column = {
      val fwd = regexp_extract(h,
        s"""(?is)<$tag\\b[^>]*$keyAttr="$keyVal"[^>]*$valAttr="([^"]*)"""", 1)
      val rev = regexp_extract(h,
        s"""(?is)<$tag\\b[^>]*$valAttr="([^"]*)"[^>]*$keyAttr="$keyVal"""", 1)
      firstNonEmpty(fwd, rev)
    }
    val canonRaw = attrPair("link", "rel", "canonical", "href")
    docs.select(col(idCol).cast(LongType).as("doc_id"),
      clean(regexp_extract(h, "(?is)<title[^>]*>(.*?)</title>", 1)).as("title"),
      clean(attrPair("meta", "name", "description", "content")).as("meta_desc"),
      clean(attrPair("meta", "property", "og:title", "content")).as("og_title"),
      canonRaw.as("canonical_raw"),
      when(canonRaw =!= "", Urls.canonicalUrl(canonRaw)).otherwise(lit(""))
        .as("canonical_url"))
  }

  /** §2 row 245 — metadata over synthetic heads that rotate the
    * attribute order and carry entities; every 9th doc has NO meta
    * tags (the empty-field branch). */
  def metaExtractQ(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val metaBlock =
      when(pmod(col("doc_id"), lit(9)) === 0, lit(""))
        .when(pmod(col("doc_id"), lit(2)) === 0, concat(
          lit("<meta name=\"description\" content=\"Summary &amp; notes for doc "), id,
          lit("\"><meta property=\"og:title\" content=\"OG "), id,
          lit("\"><link rel=\"canonical\" href=\"HTTPS://WWW.Site.COM:443/d/"), id,
          lit("?utm_source=x\">")))
        .otherwise(concat(
          lit("<meta content=\"Summary &amp; notes for doc "), id,
          lit("\" name=\"description\"><meta content=\"OG "), id,
          lit("\" property=\"og:title\"><link href=\"HTTPS://WWW.Site.COM:443/d/"), id,
          lit("?utm_source=x\" rel=\"canonical\">")))
    val html = concat(
      lit("<html><head><title> Doc &quot;"), id, lit("&quot;  page </title>"),
      metaBlock, lit("</head><body><p>"), col("text"), lit("</p></body></html>"))
    extractMeta(Tables.documents(s, dir).select(col("doc_id"), html.as("html")),
        "doc_id", "html")
      .orderBy(col("doc_id"))
  }

  /** Registered query: deterministic synthetic HTML built from the
    * documents table IN BOTH ENGINES (the truecase damage-seeding
    * precedent) — head with title/style, a body script with a `<`
    * inside (lazy-match trap), a nav and a link-heavy footer (the
    * boilerplate the gate must drop), a heading and a paragraph
    * carrying the corpus text behind entity escapes (the content it
    * must keep and decode). */
  /** Shared synthetic-HTML seeding (both registered markup queries
    * and their oracles build this byte-identically). */
  private def htmlSynth: Column = concat(
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

  def htmlExtractQ(s: SparkSession, dir: String): DataFrame =
    htmlToText(Tables.documents(s, dir).select(col("doc_id"), htmlSynth.as("html")),
        "doc_id", "html")
      .orderBy(col("doc_id"))

  /** §2 row 242 — the web-curation capstone: seeded HTML through the
    * row-231 extractor, then the row-187 charset gate, row-44 token
    * count and row-42 langid over the EXTRACTED text, with the keep
    * verdict (enough tokens, nothing suspect) a curation pass acts
    * on. Everything after the extractor is per-row codegen'd. */
  def webGateQ(s: SparkSession, dir: String): DataFrame = {
    val extracted = htmlToText(
        Tables.documents(s, dir).select(col("doc_id"), htmlSynth.as("html")),
        "doc_id", "html")
      .select(col("doc_id"), col("text_extract").as("text"))
    val cs = Hygiene.charsetAnomalies(extracted, "doc_id", "text", pctMax = 5)
      .select(col("doc_id"), col("suspect"))
    extracted.join(cs, Seq("doc_id"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
        graft.functions.TextFunctions.langId(col("text")).as("predicted_lang"),
        col("suspect"))
      .withColumn("keep", col("n_tokens") >= 10 && !col("suspect"))
      .orderBy(col("doc_id"))
  }

  /** §2 row 239 — the link edge list of a synthetic crawl: per doc an
    * absolute external link (shouting case, default port, path noise,
    * tracking params), a root-relative and a path-relative internal
    * link, a script-embedded decoy that must NOT count, and anchors
    * with inner tags / entities. */
  def linkGraphQ(s: SparkSession, dir: String): DataFrame = {
    val base = concat(lit("https://www."), lower(col("source")), lit(".com/dir/page.html"))
    val html = concat(
      lit("<html><body><script>var s = '<a href=\"/junk\">x</a>';</script>" +
        "<p><a href=\"HTTPS://Ext"), pmod(col("doc_id"), lit(5)).cast("string"),
      lit(".Example.ORG:443/a/./x/"), col("doc_id").cast("string"),
      lit("?utm_source=z&q=1#f\">Ext <b>Site</b></a> and " +
        "<a href=\"/local/"), pmod(col("doc_id"), lit(3)).cast("string"),
      lit("\">Local&nbsp;page</a> and " +
        "<a href=\"sub/p"), pmod(col("doc_id"), lit(2)).cast("string"),
      lit(".html\">rel</a></p></body></html>"))
    extractLinks(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          html.as("html"), base.as("base")),
        "doc_id", "html", col("base"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Meta-robots / X-Robots-Tag indexability gate (SURVEY.md §2 row
    * 292) — the per-PAGE opt-out that robots.txt (row 249, per-PATH)
    * cannot express, and a gate an index pipeline must honor BEFORE
    * row-280's index build: `noindex` pages may be crawled but not
    * stored, `nofollow` pages contribute no row-239 link edges. RFC
    * 9309-adjacent (Google/Bing semantics): directives come from the
    * HTML `<meta name="robots">` tag (either attribute order) AND the
    * `X-Robots-Tag` response header; the MOST RESTRICTIVE source wins
    * (an allow in one place never overrides a deny in the other);
    * `none` = `noindex, nofollow`. Pure per-row regex projection,
    * zero shuffles. */
  def robotsMeta(pages: DataFrame, idCol: Column, htmlCol: Column,
                 headerCol: Column): DataFrame = {
    val html = coalesce(htmlCol, lit(""))
    // both attribute orders; RE2-safe (no lookaround)
    val m1 = regexp_extract(html,
      "(?is)<meta[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val m2 = regexp_extract(html,
      "(?is)<meta[^>]*content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*name\\s*=\\s*[\"']?robots[\"']?", 1)
    val meta = when(m1 =!= "", m1).otherwise(m2)
    val hdr = coalesce(headerCol, lit(""))
    def has(c: Column, d: String): Column =
      lower(c).rlike("(^|[,\\s])" + d + "($|[,\\s])")
    def denyIndex(c: Column): Column = has(c, "noindex") || has(c, "none")
    def denyFollow(c: Column): Column = has(c, "nofollow") || has(c, "none")
    pages.select(idCol.as("doc_id"),
      meta.as("meta_robots"),
      (!denyIndex(meta) && !denyIndex(hdr)).as("indexable"),
      (!denyFollow(meta) && !denyFollow(hdr)).as("followable"),
      when(denyIndex(meta) || denyFollow(meta),
          when(denyIndex(hdr) || denyFollow(hdr), "both").otherwise("meta"))
        .when(denyIndex(hdr) || denyFollow(hdr), "header")
        .otherwise("default").as("deny_source"))
  }

  /** §2 row 292 — the gate over seeded pages: a mod-7 rotation covers
    * meta noindex / nofollow / none / reversed-attribute-order noindex
    * / header-only noindex / conflicting meta-allow+header-deny /
    * clean; 'noindexing' in prose must NOT match (word-boundary
    * discipline). */
  def robotsMetaQ(s: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(7))
    val metaTag =
      when(m === 0, "<meta name=\"robots\" content=\"noindex\">")
        .when(m === 1, "<meta name=\"robots\" content=\"nofollow, noarchive\">")
        .when(m === 2, "<meta name=\"robots\" content=\"none\">")
        .when(m === 3, "<meta content=\"noindex\" name=\"robots\">")
        .when(m === 5, "<meta name=\"robots\" content=\"all\">")
        .otherwise("")
    val html = concat(lit("<html><head>"), metaTag,
      lit("</head><body><p>about noindexing practices in doc "),
      col("doc_id").cast("string"), lit("</p></body></html>"))
    val hdr = when(m === 4, lit("noindex"))
      .when(m === 5, lit("noarchive, nofollow"))
      .otherwise(lit(null).cast("string"))
    robotsMeta(Tables.documents(s, dir).select(col("doc_id"),
        html.as("html"), hdr.as("xrobots")),
        col("doc_id"), col("html"), col("xrobots"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (htmlExtractQ _),
    "q_link_graph"   -> (linkGraphQ _),
    "q_web_gate"     -> (webGateQ _),
    "q_meta_extract" -> (metaExtractQ _),
    "q_html_tables"  -> (tablesQ _),
    "q_table_rows"   -> (tableRowsQ _),
    "q_jsonld"       -> (jsonLdQ _),
    "q_robots_meta"  -> (robotsMetaQ _))

  /** The extractor pipeline CTEs (strip → segment → decode → gate →
    * per-doc `agg` frame) over any CTE `in` providing (doc_id, html) —
    * the SQL twin of [[htmlToText]], shared VERBATIM by
    * q_html_extract, q_web_gate and q_warc_extract so the replays
    * cannot drift. */
  private[operators] def htmlGatePipelineCtes(in: String): String =
    """pre AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<head\b[^>]*>.*?</head>', ' ', 'g'),
      |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g') AS h
      |  FROM __IN__),
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
      |  FROM nb GROUP BY doc_id)""".stripMargin.replace("__IN__", in)

  /** Shared synthesis + pipeline for the two markup queries that seed
    * HTML straight from the documents table. */
  private[operators] val htmlGateCtes: String =
    """h AS (
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
      |""".stripMargin + htmlGatePipelineCtes("h")

  val oracles: Map[String, String] = Map(
    // same seeded rotation, both meta attribute orders with the same
    // fallback, the same word-bounded directive regexes, and the same
    // most-restrictive-wins combination
    "q_robots_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE doc_id % 7
        |      WHEN 0 THEN '<meta name="robots" content="noindex">'
        |      WHEN 1 THEN '<meta name="robots" content="nofollow, noarchive">'
        |      WHEN 2 THEN '<meta name="robots" content="none">'
        |      WHEN 3 THEN '<meta content="noindex" name="robots">'
        |      WHEN 5 THEN '<meta name="robots" content="all">'
        |      ELSE '' END AS mt,
        |    CASE doc_id % 7 WHEN 4 THEN 'noindex'
        |      WHEN 5 THEN 'noarchive, nofollow' END AS hdr
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, hdr,
        |    '<html><head>' || mt
        |      || '</head><body><p>about noindexing practices in doc '
        |      || CAST(doc_id AS VARCHAR) || '</p></body></html>' AS html
        |  FROM f),
        |x AS (
        |  SELECT doc_id, hdr,
        |    CASE WHEN regexp_extract(html,
        |        '<meta[^>]*name\s*=\s*["'']?robots["'']?[^>]*content\s*=\s*["'']([^"'']*)["'']',
        |        1, 'is') <> ''
        |      THEN regexp_extract(html,
        |        '<meta[^>]*name\s*=\s*["'']?robots["'']?[^>]*content\s*=\s*["'']([^"'']*)["'']',
        |        1, 'is')
        |      ELSE regexp_extract(html,
        |        '<meta[^>]*content\s*=\s*["'']([^"'']*)["''][^>]*name\s*=\s*["'']?robots["'']?',
        |        1, 'is') END AS meta
        |  FROM g),
        |d AS (
        |  SELECT doc_id, meta,
        |    regexp_matches(lower(meta), '(^|[,\s])(noindex|none)($|[,\s])') AS mdi,
        |    regexp_matches(lower(meta), '(^|[,\s])(nofollow|none)($|[,\s])') AS mdf,
        |    regexp_matches(lower(COALESCE(hdr, '')),
        |      '(^|[,\s])(noindex|none)($|[,\s])') AS hdi,
        |    regexp_matches(lower(COALESCE(hdr, '')),
        |      '(^|[,\s])(nofollow|none)($|[,\s])') AS hdf
        |  FROM x)
        |SELECT doc_id, meta AS meta_robots,
        |  NOT mdi AND NOT hdi AS indexable,
        |  NOT mdf AND NOT hdf AS followable,
        |  CASE WHEN (mdi OR mdf) AND (hdi OR hdf) THEN 'both'
        |       WHEN mdi OR mdf THEN 'meta'
        |       WHEN hdi OR hdf THEN 'header'
        |       ELSE 'default' END AS deny_source
        |FROM d
        |ORDER BY doc_id""".stripMargin,

    // same synthesis, same strip/segment/decode/gate pipeline on
    // DuckDB's RE2 (inline (?is) flags, lazy quantifiers and
    // string_split_regex all verified); parallel unnest carries block
    // order, link chars measured on the raw block (COALESCE: DuckDB's
    // array_to_string([]) is NULL, Spark's array_join([]) is ''), the
    // density gate cross-multiplied — identical to the engine
    "q_html_extract" ->
      ("WITH " + htmlGateCtes + """
        |SELECT d.doc_id,
        |  COALESCE(a.n_blocks, 0) AS n_blocks,
        |  COALESCE(a.n_kept, 0) AS n_kept,
        |  COALESCE(a.text_extract, '') AS text_extract
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // the capstone: extracted text through the charset gate, token
    // count and langid CASE (shared verbatim with q_charset /
    // q_token_count / q_lang_id forms), then the keep verdict
    "q_web_gate" ->
      ("WITH " + htmlGateCtes + """,
        |ex2 AS (
        |  SELECT d.doc_id, COALESCE(a.text_extract, '') AS t
        |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
        |m AS (
        |  SELECT doc_id, t,
        |    CAST(len(regexp_extract_all(t, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens,
        |    len(regexp_extract_all(lower(t), '\b(the|and|of|to|a|in)\b', 0)) AS c_en,
        |    len(regexp_extract_all(lower(t), '\b(el|la|de|que|y|en)\b', 0)) AS c_es,
        |    len(regexp_extract_all(lower(t), '\b(der|die|und|ist|das)\b', 0)) AS c_de,
        |    len(regexp_extract_all(lower(t), '\b(le|les|des|et|dans)\b', 0)) AS c_fr,
        |    CAST(length(t) AS BIGINT) AS n_chars,
        |    CAST(length(t) - length(regexp_replace(t, '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS n_nonascii,
        |    CAST(length(regexp_replace(t, '[\x00-\x08\x0B\x0C\x0E-\x1F]', 'XX', 'g')) - length(t) AS BIGINT) AS n_ctl,
        |    CAST(length(regexp_replace(t, '_REPL_', 'XX', 'g')) - length(t) AS BIGINT) AS n_repl
        |  FROM ex2)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
        |       WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
        |       WHEN c_de >= c_fr THEN 'de'
        |       ELSE 'fr' END AS predicted_lang,
        |  (n_ctl > 0 OR n_repl > 0 OR n_nonascii * 100 > n_chars * 5) AS suspect,
        |  (n_tokens >= 10 AND NOT
        |    (n_ctl > 0 OR n_repl > 0 OR n_nonascii * 100 > n_chars * 5)) AS keep
        |FROM m
        |ORDER BY doc_id""".stripMargin.replace("_REPL_", "\ufffd")),

    
    // same synthesis; typed-script block extraction (the plain <script>
    // decoy never matches), DuckDB's json_extract_string with the
    // quoted-key path for @type, NULLs on absent fields
    "q_jsonld" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      '<html><body><p>' || text || '</p></body></html>'
        |    ELSE
        |      '<html><head><script type="application/ld+json">{"@type":"Article","headline":"Doc '
        |      || CAST(doc_id AS VARCHAR) || ' headline","datePublished":"2025-01-'
        |      || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '"}</script>'
        |      || (CASE WHEN doc_id % 2 = 0 THEN
        |            '<script type="application/ld+json">{"@type":"Product","name":"P'
        |            || CAST(doc_id AS VARCHAR) || '"}</script>'
        |          ELSE '' END)
        |      || '</head><body><script>var x = 1;</script><p>' || text
        |      || '</p></body></html>' END AS html
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(html, '(?is)<script\b[^>]*type="application/ld\+json"[^>]*>(.*?)</script>', 1)) AS j,
        |    unnest(range(0, len(regexp_extract_all(html, '(?is)<script\b[^>]*type="application/ld\+json"[^>]*>(.*?)</script>', 1)))) AS block_idx
        |  FROM h)
        |SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx,
        |  json_extract_string(j, '$."@type"') AS ld_type,
        |  json_extract_string(j, '$.name') AS name,
        |  json_extract_string(j, '$.headline') AS headline,
        |  json_extract_string(j, '$.datePublished') AS date_published
        |FROM b
        |ORDER BY doc_id, block_idx""".stripMargin,

    // the cell frame (q_html_tables chain verbatim) + the header rule
    // (row 0 all-th), positional fallback, and the ordered kv join
    "q_table_rows" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      '<html><body><p>' || text || '</p></body></html>'
        |    ELSE
        |      '<html><body><table><tr><th>Name</th><th>Qty &amp; unit</th><th>Id</th></tr>'
        |      || '<tr><td>Part <b>alpha</b></td><td> 4 &lt;kg&gt; </td><td>'
        |      || CAST(doc_id AS VARCHAR)
        |      || '</td></tr></table><p>between</p>'
        |      || '<table id="x"><tr><td>only ' || CAST(doc_id AS VARCHAR)
        |      || '</td></tr></table></body></html>' END AS html
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(html, '(?is)<table\b[^>]*>(.*?)</table>', 1)) AS t,
        |    unnest(range(0, len(regexp_extract_all(html, '(?is)<table\b[^>]*>(.*?)</table>', 1)))) AS table_idx
        |  FROM h),
        |rw AS (
        |  SELECT doc_id, CAST(table_idx AS BIGINT) AS table_idx,
        |    unnest(regexp_extract_all(t, '(?is)<tr\b[^>]*>(.*?)</tr>', 1)) AS r,
        |    unnest(range(0, len(regexp_extract_all(t, '(?is)<tr\b[^>]*>(.*?)</tr>', 1)))) AS row_idx
        |  FROM tb),
        |cl AS (
        |  SELECT doc_id, table_idx, CAST(row_idx AS BIGINT) AS row_idx,
        |    unnest(regexp_extract_all(r, '(?is)<(t[hd])\b[^>]*>(.*?)</t[hd]>', 1)) AS tag,
        |    unnest(regexp_extract_all(r, '(?is)<(t[hd])\b[^>]*>(.*?)</t[hd]>', 2)) AS c,
        |    unnest(range(0, len(regexp_extract_all(r, '(?is)<(t[hd])\b[^>]*>(.*?)</t[hd]>', 1)))) AS col_idx
        |  FROM rw),
        |cells AS (
        |  SELECT doc_id, table_idx, row_idx, CAST(col_idx AS BIGINT) AS col_idx,
        |    lower(tag) = 'th' AS is_header,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(c, '<[^>]*>', '', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS cell_text
        |  FROM cl),
        |hh AS (
        |  SELECT doc_id, table_idx,
        |    MIN(CASE WHEN is_header THEN 1 ELSE 0 END) AS hh
        |  FROM cells WHERE row_idx = 0 GROUP BY doc_id, table_idx),
        |hd AS (
        |  SELECT c.doc_id, c.table_idx, c.col_idx, c.cell_text AS hname
        |  FROM cells c JOIN hh ON c.doc_id = hh.doc_id AND c.table_idx = hh.table_idx
        |  WHERE c.row_idx = 0 AND hh.hh = 1),
        |dt AS (
        |  SELECT c.doc_id, c.table_idx, c.row_idx, c.col_idx,
        |    COALESCE(hd.hname, 'c' || CAST(c.col_idx AS VARCHAR))
        |      || ': ' || c.cell_text AS kv
        |  FROM cells c
        |  JOIN hh ON c.doc_id = hh.doc_id AND c.table_idx = hh.table_idx
        |  LEFT JOIN hd ON c.doc_id = hd.doc_id AND c.table_idx = hd.table_idx
        |    AND c.col_idx = hd.col_idx
        |  WHERE c.row_idx >= hh.hh)
        |SELECT doc_id, table_idx, row_idx,
        |  string_agg(kv, ' | ' ORDER BY col_idx) AS row_text
        |FROM dt GROUP BY doc_id, table_idx, row_idx
        |ORDER BY doc_id, table_idx, row_idx""".stripMargin,

    // same synthesis; three chained parallel unnests (tables, rows,
    // cells) with the tag/content groups zipped, cell cleanup via the
    // shared strip/decode/collapse chain
    "q_html_tables" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      '<html><body><p>' || text || '</p></body></html>'
        |    ELSE
        |      '<html><body><table><tr><th>Name</th><th>Qty &amp; unit</th><th>Id</th></tr>'
        |      || '<tr><td>Part <b>alpha</b></td><td> 4 &lt;kg&gt; </td><td>'
        |      || CAST(doc_id AS VARCHAR)
        |      || '</td></tr></table><p>between</p>'
        |      || '<table id="x"><tr><td>only ' || CAST(doc_id AS VARCHAR)
        |      || '</td></tr></table></body></html>' END AS html
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(html, '(?is)<table\b[^>]*>(.*?)</table>', 1)) AS t,
        |    unnest(range(0, len(regexp_extract_all(html, '(?is)<table\b[^>]*>(.*?)</table>', 1)))) AS table_idx
        |  FROM h),
        |rw AS (
        |  SELECT doc_id, CAST(table_idx AS BIGINT) AS table_idx,
        |    unnest(regexp_extract_all(t, '(?is)<tr\b[^>]*>(.*?)</tr>', 1)) AS r,
        |    unnest(range(0, len(regexp_extract_all(t, '(?is)<tr\b[^>]*>(.*?)</tr>', 1)))) AS row_idx
        |  FROM tb),
        |cl AS (
        |  SELECT doc_id, table_idx, CAST(row_idx AS BIGINT) AS row_idx,
        |    unnest(regexp_extract_all(r, '(?is)<(t[hd])\b[^>]*>(.*?)</t[hd]>', 1)) AS tag,
        |    unnest(regexp_extract_all(r, '(?is)<(t[hd])\b[^>]*>(.*?)</t[hd]>', 2)) AS c,
        |    unnest(range(0, len(regexp_extract_all(r, '(?is)<(t[hd])\b[^>]*>(.*?)</t[hd]>', 1)))) AS col_idx
        |  FROM rw)
        |SELECT doc_id, table_idx, row_idx, CAST(col_idx AS BIGINT) AS col_idx,
        |  lower(tag) = 'th' AS is_header,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(c, '<[^>]*>', '', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS cell_text
        |FROM cl
        |ORDER BY doc_id, table_idx, row_idx, col_idx""".stripMargin,

    // same head synthesis with the attribute-order rotation; the two
    // order-tolerant regexes per field, first-nonempty pick, entity
    // decode + collapse; the canonical URL through the shared
    // canonSql fragment semantics replayed inline (scheme/host
    // lowercase, default port, utm strip on this synthetic shape)
    "q_meta_extract" ->
      ("""WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title> Doc &quot;' || CAST(doc_id AS VARCHAR)
        |    || '&quot;  page </title>'
        |    || (CASE WHEN doc_id % 9 = 0 THEN ''
        |        WHEN doc_id % 2 = 0 THEN
        |          '<meta name="description" content="Summary &amp; notes for doc '
        |          || CAST(doc_id AS VARCHAR)
        |          || '"><meta property="og:title" content="OG ' || CAST(doc_id AS VARCHAR)
        |          || '"><link rel="canonical" href="HTTPS://WWW.Site.COM:443/d/'
        |          || CAST(doc_id AS VARCHAR) || '?utm_source=x">'
        |        ELSE
        |          '<meta content="Summary &amp; notes for doc ' || CAST(doc_id AS VARCHAR)
        |          || '" name="description"><meta content="OG ' || CAST(doc_id AS VARCHAR)
        |          || '" property="og:title"><link href="HTTPS://WWW.Site.COM:443/d/'
        |          || CAST(doc_id AS VARCHAR) || '?utm_source=x" rel="canonical">'
        |        END)
        |    || '</head><body><p>' || text || '</p></body></html>' AS html
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id,
        |    regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS t0,
        |    CASE WHEN regexp_extract(html, '(?is)<meta\b[^>]*name="description"[^>]*content="([^"]*)"', 1) <> ''
        |         THEN regexp_extract(html, '(?is)<meta\b[^>]*name="description"[^>]*content="([^"]*)"', 1)
        |         ELSE regexp_extract(html, '(?is)<meta\b[^>]*content="([^"]*)"[^>]*name="description"', 1) END AS d0,
        |    CASE WHEN regexp_extract(html, '(?is)<meta\b[^>]*property="og:title"[^>]*content="([^"]*)"', 1) <> ''
        |         THEN regexp_extract(html, '(?is)<meta\b[^>]*property="og:title"[^>]*content="([^"]*)"', 1)
        |         ELSE regexp_extract(html, '(?is)<meta\b[^>]*content="([^"]*)"[^>]*property="og:title"', 1) END AS o0,
        |    CASE WHEN regexp_extract(html, '(?is)<link\b[^>]*rel="canonical"[^>]*href="([^"]*)"', 1) <> ''
        |         THEN regexp_extract(html, '(?is)<link\b[^>]*rel="canonical"[^>]*href="([^"]*)"', 1)
        |         ELSE regexp_extract(html, '(?is)<link\b[^>]*href="([^"]*)"[^>]*rel="canonical"', 1) END AS c0
        |  FROM h),
        |de AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(replace(replace(replace(replace(replace(replace(t0,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |      '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g')) AS title,
        |    trim(regexp_replace(replace(replace(replace(replace(replace(replace(d0,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |      '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g')) AS meta_desc,
        |    trim(regexp_replace(replace(replace(replace(replace(replace(replace(o0,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |      '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g')) AS og_title,
        |    c0 AS canonical_raw,
        |    CASE WHEN c0 <> '' THEN
        |      'https://www.site.com/d/' || CAST(doc_id AS VARCHAR)
        |    ELSE '' END AS canonical_url
        |  FROM ex)
        |SELECT doc_id, title, meta_desc, og_title, canonical_raw, canonical_url
        |FROM de ORDER BY doc_id""".stripMargin),

    // same synthesis; script strip first (the decoy link must not
    // count), href/anchor group extraction zipped by parallel unnest,
    // anchor tag-strip + entity decode, the absolute/root-relative/
    // path-relative resolution CASE, then Urls.canonSql keyed
    // (doc_id, pos). Composed by concatenation (the stripMargin
    // re-strip hazard, see q_url_canon).
    "q_link_graph" ->
      ("""WITH h AS (
          |  SELECT doc_id,
          |    'https://www.' || lower(source) || '.com/dir/page.html' AS base,
          |    '<html><body><script>var s = ''<a href="/junk">x</a>'';</script>'
          |    || '<p><a href="HTTPS://Ext' || CAST(doc_id % 5 AS VARCHAR)
          |    || '.Example.ORG:443/a/./x/' || CAST(doc_id AS VARCHAR)
          |    || '?utm_source=z&q=1#f">Ext <b>Site</b></a> and '
          |    || '<a href="/local/' || CAST(doc_id % 3 AS VARCHAR)
          |    || '">Local&nbsp;page</a> and '
          |    || '<a href="sub/p' || CAST(doc_id % 2 AS VARCHAR)
          |    || '.html">rel</a></p></body></html>' AS html
          |  FROM documents),
          |""".stripMargin
        + linkExtractCtes("h") + ",\n"
        + Urls.canonSql("lnk", Seq("doc_id", "pos"))
        + """
          |SELECT c.doc_id, c.pos, l.href, l.anchor, c.url_canon, c.host,
          |  c.registered_domain,
          |  c.host <> ('www.' || lower((SELECT source FROM documents d2
          |    WHERE d2.doc_id = c.doc_id)) || '.com') AS is_external
          |FROM canonized c JOIN lnk l ON c.doc_id = l.doc_id AND c.pos = l.pos
          |ORDER BY c.doc_id, c.pos""".stripMargin))

  /** The link-extraction CTE chain over any CTE `inRel(doc_id, base,
    * html)` — the SQL twin of [[extractLinks]] (script/style/comment
    * strip, parallel href/anchor group unnest, anchor clean, the
    * absolute/root-relative/path-relative resolution CASE), emitting
    * `lnk(doc_id, pos, href, anchor, url)`. Shared VERBATIM by
    * q_link_graph and q_web_index so the replays cannot drift. No
    * line here may START with `||` (the stripMargin re-strip hazard). */
  private[operators] def linkExtractCtes(inRel: String): String =
    s"""pre2 AS (
       |  SELECT doc_id, base,
       |    regexp_replace(regexp_replace(regexp_replace(html,
       |      '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
       |      '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
       |      '(?s)<!--.*?-->', ' ', 'g') AS hh
       |  FROM $inRel),
       |lx AS (
       |  SELECT doc_id, base,
       |    unnest(regexp_extract_all(hh, '(?is)<a\\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1)) AS href,
       |    unnest(regexp_extract_all(hh, '(?is)<a\\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 2)) AS anchor0,
       |    unnest(range(0, len(regexp_extract_all(hh, '(?is)<a\\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1)))) AS pos
       |  FROM pre2),
       |lnk AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, href,
       |    trim(regexp_replace(
       |      replace(replace(replace(replace(replace(replace(
       |        regexp_replace(anchor0, '<[^>]*>', '', 'g'),
       |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
       |      '\\s+', ' ', 'g')) AS anchor,
       |    CASE
       |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN href
       |      WHEN href LIKE '/%' THEN
       |        regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) || href
       |      ELSE
       |        regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)
       |        || (CASE WHEN regexp_replace(
       |              regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
       |              '[^/]*$$', '') = '' THEN '/'
       |            ELSE regexp_replace(
       |              regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
       |              '[^/]*$$', '') END)
       |        || href END AS url
       |  FROM lx)""".stripMargin
}
