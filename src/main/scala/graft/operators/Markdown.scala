package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Markdown → plain-text linearization (SURVEY.md §2 row 289) — the
  * markdown twin of row 231's HTML gate: GitHub READMEs, docs sites
  * and forum exports arrive as markdown, and a training pipeline wants
  * the PROSE (for quality gates, dedup, tokenization) with the markup
  * stripped but link/image TEXT kept — `[docs](http://...)` carries
  * the word "docs", not the URL. Deterministic regex passes, ordered
  * so each consumes what the next must not see:
  *
  *   1. fenced code blocks dropped whole (``` ... ``` — code is not
  *      prose; the row-234-style code-data path keeps them instead);
  *   2. inline code unwrapped (`x` → x: identifiers read as words);
  *   3. images → alt text, THEN links → anchor text (the image regex
  *      is the link regex plus `!` — ordering prevents a half-strip);
  *   4. ATX headings, blockquote markers, list bullets stripped at
  *      line starts; emphasis runs (`**`/`__`/`*`/`_`) dropped;
  *   5. whitespace collapsed.
  *
  * Every pattern is RE2-safe (no lookaround, no pattern backrefs) so
  * the DuckDB oracle replays the identical passes. Alongside the text
  * ride the structural counts a corpus audit reads (links, images,
  * code fences, headings) — computed BEFORE stripping.
  *
  * Scale shape: a pure per-row projection, zero shuffles (the row-270
  * posture); regex work is linear in the doc. */
object Markdown {

  private def strip(c: Column, pattern: String, repl: String): Column =
    regexp_replace(c, pattern, repl)

  /** The plain text of a markdown column. */
  def mdToText(md: Column): Column = {
    val noFence = strip(coalesce(md, lit("")), "(?s)```.*?(```|$)", " ")
    val noInline = strip(noFence, "`([^`]*)`", "$1")
    val noImg = strip(noInline, "!\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    val noLink = strip(noImg, "\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    val noHead = strip(noLink, "(?m)^#{1,6}[ \\t]*", "")
    val noBlock = strip(noHead, "(?m)^[ \\t]*(>|[-*+]|[0-9]+\\.)[ \\t]+", "")
    // emphasis runs strip only at whitespace/string edges (RE2 has no
    // lookaround): `**bold**` and `_it_` unwrap, snake_case
    // identifiers keep their underscores
    val noEmphL = strip(noBlock, "(^|\\s)[*_]+", "$1")
    val noEmph = strip(noEmphL, "[*_]+(\\s|$)", "$1")
    trim(strip(noEmph, "\\s+", " "))
  }

  /** Linearize + structural audit: (id, text, n_links, n_images,
    * n_fences, n_headings). Counts run on the RAW markdown. */
  def linearize(docs: DataFrame, idCol: Column, mdCol: Column): DataFrame = {
    val md = coalesce(mdCol, lit(""))
    docs.select(idCol.as("doc_id"),
      mdToText(mdCol).as("text"),
      size(regexp_extract_all(
        // links = bracket-paren pairs NOT preceded by ! — counted as
        // (all pairs) minus (image pairs) since RE2 has no lookbehind
        md, lit("\\[[^\\]]*\\]\\([^)]*\\)"), lit(0))).cast(LongType)
        .minus(size(regexp_extract_all(
          md, lit("!\\[[^\\]]*\\]\\([^)]*\\)"), lit(0))).cast(LongType))
        .as("n_links"),
      size(regexp_extract_all(
        md, lit("!\\[[^\\]]*\\]\\([^)]*\\)"), lit(0))).cast(LongType)
        .as("n_images"),
      size(regexp_extract_all(md, lit("(?s)```.*?(```|$)"), lit(0)))
        .cast(LongType).as("n_fences"),
      size(regexp_extract_all(md, lit("(?m)^#{1,6}[ \\t]"), lit(0)))
        .cast(LongType).as("n_headings"))
  }

  /** §2 row 289 — a deterministic markdown rendering of each document
    * (heading from the source, every 6th word linked, every 11th
    * emphasized, a code fence around words 20..23, a bullet prefix on
    * the second "line") linearized back; the oracle replays BOTH the
    * rendering and the stripping, so the pass order is value-checked
    * against text that exercises every rule. */
  def mdLinearizeQ(s: SparkSession, d: String): DataFrame = {
    val ws = filter(split(coalesce(col("text"), lit("")), "\\s+"), w => w =!= "")
    val decorated = transform(ws, (w, i) =>
      when(pmod(i, lit(6)) === 5, concat(lit("["), w, lit("](http://x.test/"),
        i.cast("string"), lit(")")))
        .when(pmod(i, lit(11)) === 10, concat(lit("**"), w, lit("**")))
        .otherwise(w))
    val md = concat(
      lit("## Doc "), col("doc_id").cast("string"), lit("\n\n"),
      lit("> from "), col("source"), lit("\n\n- "),
      array_join(slice(decorated, 1, 19), " "),
      lit("\n\n```\n"), array_join(slice(decorated, 20, 4), " "),
      lit("\n```\n\n"),
      array_join(slice(decorated, 24, 1000000), " "))
    linearize(Tables.documents(s, d).withColumn("md", md),
        col("doc_id"), col("md"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_md_linearize" -> (mdLinearizeQ _))

  val oracles: Map[String, String] = Map(
    // identical rendering and identical pass order, with the (?s)/(?m)
    // flags INLINE in the pattern exactly like the engine (DuckDB's
    // 'm' regex OPTION is newline-sensitivity, NOT RE2 multi-line —
    // measured: '^' stayed string-anchored under it), and \1 group
    // refs where Spark uses $1
    "q_md_linearize" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |dec AS (
        |  SELECT doc_id, source,
        |    list_transform(ws, (x, i) ->
        |      CASE WHEN (i - 1) % 6 = 5
        |             THEN '[' || x || '](http://x.test/' || CAST(i - 1 AS VARCHAR) || ')'
        |           WHEN (i - 1) % 11 = 10 THEN '**' || x || '**'
        |           ELSE x END) AS dw
        |  FROM w),
        |md AS (
        |  -- COALESCE on every slice join: DuckDB's l[a:] is NULL (not
        |  -- []) when a exceeds len(l), and one NULL sinks the concat
        |  SELECT doc_id,
        |    '## Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10)
        |      || '> from ' || source || chr(10) || chr(10) || '- '
        |      || COALESCE(array_to_string(dw[1:19], ' '), '')
        |      || chr(10) || chr(10) || '```' || chr(10)
        |      || COALESCE(array_to_string(dw[20:23], ' '), '')
        |      || chr(10) || '```' || chr(10) || chr(10)
        |      || COALESCE(array_to_string(dw[24:], ' '), '') AS m
        |  FROM dec),
        |st AS (
        |  SELECT doc_id, m,
        |    regexp_replace(m, '(?s)```.*?(```|$)', ' ', 'g') AS s1
        |  FROM md),
        |s2 AS (SELECT doc_id, m, regexp_replace(s1, '`([^`]*)`', '\1', 'g') AS s FROM st),
        |s3 AS (SELECT doc_id, m,
        |  regexp_replace(s, '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS s FROM s2),
        |s4 AS (SELECT doc_id, m,
        |  regexp_replace(s, '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS s FROM s3),
        |s5 AS (SELECT doc_id, m,
        |  regexp_replace(s, '(?m)^#{1,6}[ \t]*', '', 'g') AS s FROM s4),
        |s6 AS (SELECT doc_id, m,
        |  regexp_replace(s, '(?m)^[ \t]*(>|[-*+]|[0-9]+\.)[ \t]+', '', 'g') AS s FROM s5),
        |s6b AS (SELECT doc_id, m,
        |  regexp_replace(s, '(^|\s)[*_]+', '\1', 'g') AS s FROM s6),
        |s7 AS (SELECT doc_id, m,
        |  regexp_replace(s, '[*_]+(\s|$)', '\1', 'g') AS s FROM s6b)
        |SELECT doc_id,
        |  trim(regexp_replace(s, '\s+', ' ', 'g')) AS text,
        |  CAST(len(regexp_extract_all(m, '\[[^\]]*\]\([^)]*\)', 0))
        |    - len(regexp_extract_all(m, '!\[[^\]]*\]\([^)]*\)', 0)) AS BIGINT)
        |    AS n_links,
        |  CAST(len(regexp_extract_all(m, '!\[[^\]]*\]\([^)]*\)', 0)) AS BIGINT)
        |    AS n_images,
        |  CAST(len(regexp_extract_all(m, '(?s)```.*?(```|$)', 0)) AS BIGINT)
        |    AS n_fences,
        |  CAST(len(regexp_extract_all(m, '(?m)^#{1,6}[ \t]', 0)) AS BIGINT)
        |    AS n_headings
        |FROM s7
        |ORDER BY doc_id""".stripMargin)
}
