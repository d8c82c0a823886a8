package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** One-pass corpus scan operators (round 15):
  *
  *  - [[multiPatternHits]] — Aho–Corasick multi-substring counting
  *    (SURVEY.md §2 row 309): N patterns in ONE pass over the bytes
  *    via [[graft.plans.MultiPatternCount]], overlapping matches and
  *    nested patterns included. The raw-substring complement of the
  *    word-boundary [[Blocklist]]: PII fragments, profanity stems,
  *    template markers. At 100 TB the automaton (one array lookup per
  *    byte, any N) replaces N regexp scans of the corpus.
  *  - [[vocabGrowth]] — the vocabulary-growth (Heaps-law) curve
  *    (SURVEY.md §2 row 310): |distinct tokens seen in the first N
  *    corpus tokens| for a ladder of N — the standard corpus-health
  *    audit (a flattening curve means duplication/templating; a
  *    too-steep one means OCR noise or mojibake minting fake types).
  *    The transcendental Heaps FIT stays client-side; the curve
  *    itself is all-integer and oracle-exact.
  *
  * Scale shapes: multiPatternHits is a pure per-row projection (no
  * shuffle beyond the caller's sink). vocabGrowth is one token
  * explode, one per-doc length aggregate, the BUCKETED prefix-sum
  * (Prefix.cumSumBucketed — never a single global window task), one
  * (token → min position) aggregate, and a constant ladder of
  * conditional sums — every stage map-side combinable. */
object ScanOps {

  /** The curated fragment list of the registered query. Deliberately
    * exercises the automaton's hard cases: `ow` is nested inside
    * `row`/`window`/`slow`; `batch batch` self-overlaps in
    * `batch batch batch`; `é` is multi-byte and never matches the
    * ASCII corpus (pinning zero-count behavior). */
  val Fragments: Seq[String] = Seq(
    "merge", "spark", "row", "ow", "ta", "batch batch", "stream", "so", "é")

  /** Per-(doc, pattern) occurrence counts (overlapping included),
    * zero-count pairs dropped. One automaton pass per row. */
  def multiPatternHits(docs: DataFrame, idCol: Column, textCol: Column,
                       patterns: Seq[String]): DataFrame = {
    val counts = graft.plans.MultiPatternCount.multi_pattern_count(
      lower(TextFunctions.nullToEmpty(textCol)), patterns)
    docs.select(idCol.as("doc_id"), posexplode(counts).as(Seq("__pi", "n_hits")))
      .filter(col("n_hits") > 0)
      .withColumn("pattern",
        element_at(array(patterns.map(lit): _*), col("__pi") + 1))
      .select(col("doc_id"), col("pattern"), col("n_hits"))
  }

  /** §2 row 309 registered query. */
  def multiMatchQ(s: SparkSession, d: String): DataFrame =
    multiPatternHits(Tables.documents(s, d), col("doc_id"), col("text"), Fragments)
      .orderBy(col("doc_id"), col("pattern"))

  /** The prefix ladder of the registered query: 4× steps from 4 —
    * constant row count at any corpus size, and the low rungs keep
    * the GROWTH PHASE visible even on a small closed vocabulary
    * (where a 1k+ ladder would read as one flat line). */
  val GrowthLadder: Seq[Long] =
    Seq(4L, 16L, 64L, 256L, 1024L, 4096L, 16384L, 65536L, 262144L, 1048576L)

  /** (n_prefix, vocab): distinct tokens whose FIRST occurrence falls
    * in the first `n` corpus tokens, for each ladder n. The corpus
    * order is (doc_id, position) — total and engine-independent. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  ladder: Seq[Long] = GrowthLadder): DataFrame = {
    require(ladder.nonEmpty && ladder.forall(_ > 0), "bad ladder")
    val toks = docs.select(col(idCol).as("__id"),
      posexplode(TextFunctions.words(col(textCol))).as(Seq("__pos", "__w")))
    val lens = toks.groupBy(col("__id")).agg(count(lit(1)).as("__len"))
    // inclusive bucketed cumsum over doc_id -> exclusive doc offset
    val offs = Prefix.cumSumBucketed(lens, "__id", descending = false,
        tieCols = Nil, valueCol = "__len", out = "__cum")
      .select(col("__id"), (col("__cum") - col("__len")).as("__off"))
    val first = toks.join(offs, Seq("__id"))
      .select(col("__w"), (col("__off") + col("__pos")).as("__gpos"))
      .groupBy(col("__w")).agg(min(col("__gpos")).as("__fp"))
    val vocabAt = ladder.map(n =>
      sum(when(col("__fp") < n, 1L).otherwise(0L)).as(s"__v$n"))
    first.agg(vocabAt.head, vocabAt.tail: _*)
      .select(posexplode(array(ladder.map(n => col(s"__v$n")): _*))
        .as(Seq("__i", "vocab")))
      .withColumn("n_prefix",
        element_at(array(ladder.map(lit): _*), col("__i") + 1))
      .select(col("n_prefix"), col("vocab"))
      .orderBy(col("n_prefix"))
  }

  /** §2 row 310 registered query. */
  def vocabGrowthQ(s: SparkSession, d: String): DataFrame =
    vocabGrowth(Tables.documents(s, d), "doc_id", "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multi_match"  -> (multiMatchQ _),
    "q_vocab_growth" -> (vocabGrowthQ _),
  )

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  val oracles: Map[String, String] = Map(
    // overlapping-occurrence counts by brute character-position probes
    // (regexp_extract_all would undercount overlaps like 'batch batch')
    "q_multi_match" -> {
      val pats = Fragments.map(p => s"(${sqlLit(p)})").mkString(", ")
      s"""WITH pats(pattern) AS (VALUES $pats),
         |d AS MATERIALIZED (SELECT doc_id, lower(text) AS t FROM documents),
         |probes AS (
         |  SELECT d.doc_id, p.pattern
         |  FROM d, pats p,
         |    LATERAL (SELECT unnest(range(1,
         |      length(d.t) - length(p.pattern) + 2)) AS i) i
         |  WHERE substr(d.t, CAST(i.i AS INTEGER),
         |          length(p.pattern)) = p.pattern)
         |SELECT doc_id, pattern, CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM probes GROUP BY 1, 2
         |ORDER BY doc_id, pattern""".stripMargin
    },

    // the same (doc_id, pos) global order via a window cumsum; vocab
    // at n = |tokens with first occurrence < n|
    "q_vocab_growth" -> {
      val lad = GrowthLadder.map(n => s"($n)").mkString(", ")
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS ws
         |  FROM documents),
         |tk AS (
         |  SELECT doc_id, CAST(i.i - 1 AS BIGINT) AS pos,
         |    ws[CAST(i.i AS INTEGER)] AS wd
         |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) i),
         |gl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM tk GROUP BY 1),
         |os AS (
         |  SELECT doc_id, SUM(len) OVER (ORDER BY doc_id) - len AS off FROM gl),
         |fp AS (
         |  SELECT tk.wd, MIN(os.off + tk.pos) AS fp
         |  FROM tk JOIN os USING (doc_id) GROUP BY tk.wd),
         |lad(n) AS (VALUES $lad)
         |SELECT CAST(lad.n AS BIGINT) AS n_prefix,
         |  CAST(COALESCE(SUM(CASE WHEN fp.fp < lad.n THEN 1 END), 0) AS BIGINT) AS vocab
         |FROM lad LEFT JOIN fp ON fp.fp < lad.n
         |GROUP BY lad.n
         |ORDER BY n_prefix""".stripMargin
    },
  )
}
