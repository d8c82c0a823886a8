package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Exact duplicated-substring detection and removal (SURVEY.md §2.7):
  * the word-level form of exact substring dedup from Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" — find
  * every span of `n` consecutive (normalized) words that occurs more
  * than once ANYWHERE in the corpus (across documents or repeated
  * within one), merge overlapping occurrences into maximal per-doc
  * spans, and optionally scrub the covered words out of the text.
  *
  * Near-dup doc removal (MinHash) and exact doc dedup miss this class
  * entirely: two long documents sharing one boilerplate paragraph are
  * not near-dups, but the paragraph still memorizes. This operator is
  * the standard third leg of a pre-training dedup stack.
  *
  * Scale shape (100 TB): the gram stream is O(total words) rows of
  * (doc_id, pos, 8-byte hash) — one sort-shuffle per doc for the lead
  * window, one hash-partition shuffle with map-side combine for the
  * occurrence counts. Duplicated grams are a tiny fraction of the
  * corpus, so the join back is broadcast-shaped under AQE, and the
  * interval merge windows only over dup occurrences. Nothing is ever
  * wider than a (doc_id, pos, hash) row; no driver state. Grams are
  * compared by xxhash64 — a 64-bit collision could over-mark one span
  * (never under-mark); the DuckDB oracle compares gram STRINGS, so a
  * correctness run doubles as a collision check.
  */
object SubstringDedup {

  /** Position-annotated word n-gram hashes: (doc_id, pos, h), pos
    * 0-based over the normalized word stream. Array indexing at
    * explode time ([[TextFunctions.tokenLeadRows]]) — zero shuffles;
    * the gram stream's first exchange is its consumer's. */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    require(n >= 2, s"span gram length must be >= 2, got $n")
    TextFunctions.tokenLeadRows(docs, Seq(col(idCol).as("__id")),
        col(textCol), n)
      .filter(col(s"__l${n - 1}").isNotNull)
      .select(col("__id"), col("__pos").cast(LongType).as("__pos"),
        xxhash64(concat_ws(" ",
          (col("__w") +: (1 until n).map(i => col(s"__l$i"))): _*)).as("__h"))
  }

  /** Maximal duplicated spans per document: (idCol, span_start,
    * span_end, n_words), positions 0-based word indexes, end exclusive.
    * A span is any union of overlapping/adjacent length-`n` gram
    * occurrences whose gram appears >= `minCount` times corpus-wide. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 10, minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // persisted: the gram stream feeds BOTH the count pass and the
    // occurrence join — without the cache the per-doc lead-window sort
    // (the operator's dominant cost) runs twice
    val grams = gramRows(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // counts collapse map-side; the surviving dup-hash set is small, so
    // AQE broadcasts it into the occurrence join
    val dupH = grams.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select(col("__h"))
    val occ = grams.join(dupH, Seq("__h")).select(col("__id"), col("__pos"))
    mergeSpans(occ, n)
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_words"))
  }

  /** Classic interval merge as one window pass over occ(__id, __pos):
    * a new span starts when this occurrence begins past the running
    * max end of everything before it ([pos, pos+n) half-open, so
    * adjacency pos == prevEnd merges). */
  private def mergeSpans(occ: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val prevEnd = max(col("__pos") + lit(n.toLong))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    occ
      .withColumn("__brk",
        when(col("__pos") > coalesce(prevEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("__gid", sum(col("__brk")).over(w))
      .groupBy(col("__id"), col("__gid"))
      .agg(min(col("__pos")).as("span_start"),
        (max(col("__pos")) + lit(n.toLong)).as("span_end"))
      .select(col("__id"), col("span_start"), col("span_end"))
  }

  /** Multi-length dup-span cascade (SURVEY.md §2 row 235) — Lee et
    * al.'s longest-match refinement over the fixed-n [[dupSpans]]:
    * run the duplicated-gram detection at every length in `ns`
    * (default 8/16/32), merge ALL occurrences (variable-length
    * intervals) into maximal per-doc spans, and attribute each span
    * with `max_gram` = the longest gram length that fired inside it.
    * A span carrying max_gram=32 is verbatim long duplication (the
    * memorization signal); max_gram=8-only spans are short shared
    * boilerplate a long-gram pass would miss. The union span set ==
    * the smallest-n span set (any long dup contains short dups); the
    * cascade's value is the attribution.
    *
    * Scale shape: ONE zero-shuffle explode pass builds every length
    * (leads to max(ns)−1 read by array indexing once, per-length
    * hashes projected from the same row — NOT one pass per length,
    * and no token-stream sort at all); per-length
    * counts collapse map-side keyed (n, hash); the dup-key join back
    * is AQE-broadcast-shaped; the merge windows only over dup
    * occurrences. Same ids+hash row-width discipline as dupSpans. */
  def dupSpansCascade(docs: DataFrame, idCol: String, textCol: String,
                      ns: Seq[Int] = Seq(8, 16, 32),
                      minCount: Int = 2): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), s"gram lengths must be >= 2: $ns")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val nMax = ns.max
    val base = TextFunctions.tokenLeadRows(docs, Seq(col(idCol).as("__id")),
        col(textCol), nMax)
      .withColumn("__pos", col("__pos").cast(LongType))
    val perLen = array(ns.sorted.map { n =>
      struct(lit(n.toLong).as("n"),
        when(col(s"__l${n - 1}").isNotNull,
          xxhash64(concat_ws(" ",
            (col("__w") +: (1 until n).map(i => col(s"__l$i"))): _*))).as("h"))
    }: _*)
    // persisted for the same two-consumer reason as dupSpans — the
    // single fused lead-window pass must not run once per consumer
    val grams = base
      .select(col("__id"), col("__pos"), explode(perLen).as("__e"))
      .select(col("__id"), col("__pos"),
        col("__e.n").as("__n"), col("__e.h").as("__h"))
      .filter(col("__h").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupKeys = grams.groupBy(col("__n"), col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select(col("__n"), col("__h"))
    val occ = grams.join(dupKeys, Seq("__n", "__h"))
      .select(col("__id"), col("__pos"),
        (col("__pos") + col("__n")).as("__end"), col("__n"))
    // variable-length interval merge: (pos, end) is unique per doc
    // (end encodes the length), so the ROWS window order is total
    val mw = Window.partitionBy(col("__id")).orderBy(col("__pos"), col("__end"))
    val prevEnd = max(col("__end"))
      .over(mw.rowsBetween(Window.unboundedPreceding, -1))
    occ
      .withColumn("__brk",
        when(col("__pos") > coalesce(prevEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("__gid", sum(col("__brk")).over(mw))
      .groupBy(col("__id"), col("__gid"))
      .agg(min(col("__pos")).as("span_start"), max(col("__end")).as("span_end"),
        max(col("__n")).as("max_gram"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_words"), col("max_gram"))
  }

  /** Within-document repetition spans (keep-first): occurrences of an
    * n-gram strictly AFTER its first occurrence in the SAME document,
    * merged into maximal spans — the "truncate looped/self-repeating
    * text" pass, distinct from [[dupSpans]] (corpus-wide counts scrub
    * EVERY occurrence including the first; here the FIRST
    * occurrence's span survives — note that for loops whose period is
    * shorter than n the scrub truncates to the unrepeated prefix, e.g.
    * "a a a a" at n=2 keeps just "a", pinned in spec). One extra
    * shuffle keys (doc, gram)
    * for the per-doc first-occurrence window — still ids+hash only. */
  def selfRepeatSpans(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    val grams = gramRows(docs, idCol, textCol, n)
    val byGram = Window.partitionBy(col("__id"), col("__h"))
    val occ = grams
      .withColumn("__first", min(col("__pos")).over(byGram))
      .filter(col("__pos") > col("__first"))
      .select(col("__id"), col("__pos"))
    mergeSpans(occ, n)
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_words"))
  }

  /** Scrub the self-repeated spans (keep-first) out of the normalized
    * text; output shape matches [[scrubDupSpans]]. */
  def selfRepeatScrub(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    scrubSpans(docs, idCol, textCol, selfRepeatSpans(docs, idCol, textCol, n))

  /** Scrub every duplicated span out of the (normalized) text: one row
    * per input doc with `clean_text` = the surviving words joined by
    * single spaces (the identity on docs without dup spans, since
    * [[TextFunctions.normalize]] IS single-space word joining) and
    * `n_removed` = covered word count. Covered positions are the
    * merged spans exploded back out — O(covered words), bounded by the
    * corpus word count. */
  def scrubDupSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 10, minCount: Int = 2): DataFrame =
    scrubSpans(docs, idCol, textCol, dupSpans(docs, idCol, textCol, n, minCount))

  /** Scrub arbitrary half-open word spans (idCol, span_start,
    * span_end) out of the normalized text. */
  private def scrubSpans(docs: DataFrame, idCol: String, textCol: String,
                         spans: DataFrame): DataFrame = {
    val covered = spans.select(col(idCol).as("__id"),
      explode(sequence(col("span_start"), col("span_end") - 1)).as("__pos"))
    val words = docs.select(col(idCol).as("__id"),
      posexplode(TextFunctions.words(col(textCol))).as(Seq("__pos", "__w")))
      .withColumn("__pos", col("__pos").cast(LongType))
    val kept = words.join(covered, Seq("__id", "__pos"), "left_anti")
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__w")))).as("__ws"),
        count(lit(1)).as("__n_kept"))
      .select(col("__id"),
        concat_ws(" ", transform(col("__ws"), s => s.getField("__w"))).as("clean_text"),
        col("__n_kept"))
    docs.select(col(idCol).as("__id"),
        size(TextFunctions.words(col(textCol))).cast(LongType).as("__n_total"))
      .join(kept, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__n_total") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
  }

  /** §2.7 — duplicated 10-gram spans over `documents`. */
  def dupSpansQ(s: SparkSession, d: String): DataFrame =
    dupSpans(Tables.documents(s, d), "doc_id", "text", n = 10)
      .orderBy(col("doc_id"), col("span_start"))

  /** §2.7 — the scrubbed corpus (normalized text minus dup spans). */
  def dupScrubQ(s: SparkSession, d: String): DataFrame =
    scrubDupSpans(Tables.documents(s, d), "doc_id", "text", n = 10)
      .orderBy(col("doc_id"))

  /** §2.11 — the corpus with within-doc bigram repetition scrubbed
    * (keep-first). */
  def selfRepeatScrubQ(s: SparkSession, d: String): DataFrame =
    selfRepeatScrub(Tables.documents(s, d), "doc_id", "text", n = 2)
      .orderBy(col("doc_id"))

  /** §2 row 235 — the 8/16/32 cascade over `documents`. */
  def dupSpansMultiQ(s: SparkSession, d: String): DataFrame =
    dupSpansCascade(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"), col("span_start"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_spans"        -> (dupSpansQ _),
    "q_dup_scrub"        -> (dupScrubQ _),
    "q_self_repeat_scrub" -> (selfRepeatScrubQ _),
    "q_dup_spans_multi"  -> (dupSpansMultiQ _),
  )

  /** 0-based gram positions to mirror posexplode; gram strings instead
    * of hashes (the collision-check side of the parity argument). */
  private def gramSql(n: Int): String = {
    val terms = (1 to n).map(i => s"ws[i+$i]").mkString(", ")
    s"""SELECT doc_id, CAST(i AS BIGINT) AS pos, concat_ws(' ', $terms) AS sh
       |FROM (SELECT doc_id,
       |        regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS ws
       |      FROM documents) w,
       |  LATERAL (SELECT unnest(range(0, greatest(len(ws) - ${n - 1}, 0))) AS i) _i""".stripMargin
  }

  /** The shared interval-merge CTE chain (occ -> spans), the SQL twin
    * of [[mergeSpans]]. */
  private def mergeSqlCtes(n: Int): String =
    s"""b AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > COALESCE(MAX(pos + $n) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS brk
       |  FROM occ),
       |gr AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid FROM b),
       |spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + $n AS span_end
       |  FROM gr GROUP BY doc_id, gid)""".stripMargin

  private def spansSql(n: Int): String =
    s"""WITH g AS (${gramSql(n)}),
       |dup AS (SELECT sh FROM g GROUP BY sh HAVING COUNT(*) >= 2),
       |occ AS (SELECT doc_id, pos FROM g WHERE sh IN (SELECT sh FROM dup)),
       |${mergeSqlCtes(n)}""".stripMargin

  /** Keep-first self-repetition spans: occurrences after the first of
    * the same gram in the same doc, merged with the shared interval
    * logic. */
  private def selfSpansSql(n: Int): String =
    s"""WITH g AS (${gramSql(n)}),
       |firsts AS (SELECT doc_id, sh, MIN(pos) AS fp FROM g GROUP BY doc_id, sh),
       |occ AS (SELECT g.doc_id, g.pos FROM g
       |        JOIN firsts f ON g.doc_id = f.doc_id AND g.sh = f.sh
       |        WHERE g.pos > f.fp),
       |${mergeSqlCtes(n)}""".stripMargin

  /** The scrub-replay tail shared by the corpus-wide and keep-first
    * scrub oracles (spans CTE -> reassembled clean text), the SQL twin
    * of [[scrubSpans]]. */
  private val scrubSqlTail: String =
    """covered AS (
      |  SELECT DISTINCT doc_id, unnest(range(span_start, span_end)) AS pos FROM spans),
      |wp AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i+1] AS w
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS ws
      |        FROM documents) t,
      |    LATERAL (SELECT unnest(range(0, len(ws))) AS i) _i),
      |kept AS (
      |  SELECT wp.doc_id, wp.pos, wp.w FROM wp
      |  WHERE NOT EXISTS (SELECT 1 FROM covered c
      |                    WHERE c.doc_id = wp.doc_id AND c.pos = wp.pos))
      |SELECT d.doc_id,
      |  COALESCE(k.clean_text, '') AS clean_text,
      |  CAST(len(d2.ws) AS BIGINT) - COALESCE(k.n_kept, 0) AS n_removed
      |FROM documents d
      |JOIN (SELECT doc_id,
      |        regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS ws
      |      FROM documents) d2 ON d.doc_id = d2.doc_id
      |LEFT JOIN (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
      |             COUNT(*) AS n_kept
      |           FROM kept GROUP BY doc_id) k ON d.doc_id = k.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_self_repeat_scrub" ->
      s"""${selfSpansSql(2)},
         |$scrubSqlTail""".stripMargin,

    "q_dup_spans" ->
      s"""${spansSql(10)}
         |SELECT doc_id, span_start, span_end, span_end - span_start AS n_words
         |FROM spans
         |ORDER BY doc_id, span_start""".stripMargin,

    "q_dup_scrub" ->
      s"""${spansSql(10)},
         |$scrubSqlTail""".stripMargin,

    // per-length gram streams replayed as STRINGS (the collision-check
    // side of the parity argument), unioned as variable-length
    // intervals, merged with the shared running-max-end rule ((pos,
    // end) unique per doc -> the ROWS order is total), MAX(n) per
    // merged group = the longest-match attribution
    "q_dup_spans_multi" -> {
      def occN(n: Int) =
        s"""(SELECT doc_id, pos, pos + $n AS e, CAST($n AS BIGINT) AS n
           |FROM g$n WHERE sh IN (
           |  SELECT sh FROM g$n GROUP BY sh HAVING COUNT(*) >= 2))""".stripMargin
      s"""WITH g8 AS (${gramSql(8)}),
         |g16 AS (${gramSql(16)}),
         |g32 AS (${gramSql(32)}),
         |occ AS (${occN(8)} UNION ALL ${occN(16)} UNION ALL ${occN(32)}),
         |b AS (
         |  SELECT doc_id, pos, e, n,
         |    CASE WHEN pos > COALESCE(MAX(e) OVER (
         |        PARTITION BY doc_id ORDER BY pos, e
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |      THEN 1 ELSE 0 END AS brk
         |  FROM occ),
         |gr AS (SELECT doc_id, pos, e, n,
         |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos, e
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
         |       FROM b)
         |SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end,
         |  MAX(e) - MIN(pos) AS n_words, MAX(n) AS max_gram
         |FROM gr GROUP BY doc_id, gid
         |ORDER BY doc_id, span_start""".stripMargin
    },
  )
}
