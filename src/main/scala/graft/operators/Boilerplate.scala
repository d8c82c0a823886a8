package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Frequent-segment (boilerplate) removal — the line-level dedup pass
  * of web-corpus pipelines (CCNet's per-shard line dedup, RefinedWeb /
  * Dolma's repeated-line scrubbing): segments that recur across MANY
  * documents (navigation chrome, cookie banners, license footers) are
  * counted corpus-wide and scrubbed from every document IN PLACE,
  * preserving the order of what remains. Distinct from the substring
  * family (SubstringDedup: spans shared between PAIRS of docs) — here
  * the unit is a whole segment and the signal is corpus-wide document
  * frequency, not pairwise overlap.
  *
  * Scale shape (100 TB): counting shuffles (segment, partial-count)
  * pairs — segments are short by construction and map-side combine
  * collapses the Zipf head before the exchange; `array_distinct`
  * inside the projection makes plain `count(1)` a distinct-doc count,
  * so no two-phase count(DISTINCT) expansion. The scrub side joins the
  * exploded segments against the boilerplate set by hash — the set is
  * tiny by construction (segments above a document-frequency threshold
  * are the Zipf head) and BROADCASTS; the only corpus-scale exchange is
  * the doc_id regroup that reassembles the surviving text, the same
  * cost class as any text-rewriting pass (a bucketed layout on doc_id,
  * §2.10 row 122, removes it entirely).
  *
  * Hash membership stands in for string membership (the decontaminate
  * posture): 64-bit xxhash collisions are ~0 at any corpus size, and
  * the oracle replays membership on the segment STRINGS.
  */
object Boilerplate {

  /** Segmenter for real line-structured text. */
  def lineSegments(textCol: Column): Column = split(textCol, "\n")

  /** Segmenter for the synthetic tables (no newlines): consecutive
    * non-overlapping `w`-token windows of the normalized words; the
    * tail keeps its short remainder so reassembly is lossless. */
  def fixedTokenSegments(textCol: Column, w: Int): Column = {
    require(w > 0, s"segment width must be positive, got $w")
    val ws = TextFunctions.words(textCol)
    transform(
      sequence(lit(0), ceil(size(ws) / lit(w.toDouble)).cast(IntegerType) - 1),
      i => concat_ws(" ", slice(ws, i * w + 1, lit(w))))
  }

  /** Corpus-wide document frequency per segment: one row per distinct
    * segment, `n_docs` = number of distinct documents containing it.
    * `array_distinct` dedups within each doc BEFORE the explode, so the
    * aggregate is a plain count with map-side combine.
    *
    * Groups by the segment STRING, not its hash: this table is the
    * user-facing frequency report, so a 64-bit collision must not be
    * able to merge two distinct segments' counts. Segments are short by
    * construction (w tokens / one line) and map-side combine collapses
    * the Zipf head before the exchange, so the string key costs little;
    * hashing stays confined to the scrub JOIN side, where membership is
    * the only question and the collision caveat is documented. */
  def segmentFrequencies(docs: DataFrame, idCol: Column,
                         segsCol: Column): DataFrame =
    docs.select(idCol.as("__id"), explode(array_distinct(segsCol)).as("segment"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_docs"))

  /** Threshold policies over [[segmentFrequencies]] — compose freely:
    * absolute document count, or the top-`n` Zipf head (scale-stable
    * output size; rank ties broken by segment text). */
  def frequentSegments(freq: DataFrame, minDocs: Long): DataFrame =
    freq.filter(col("n_docs") >= minDocs)

  def topSegments(freq: DataFrame, n: Int): DataFrame =
    freq.orderBy(col("n_docs").desc, col("segment")).limit(n)

  /** Remove every segment in `boiler` (column `segment`) from every
    * document, reassembling the survivors in original order with `sep`.
    * Docs whose segments are ALL boilerplate stay in the output with
    * empty text — scrubbing must never drop a document silently.
    * Output: id, text_clean, n_removed. */
  def scrubSegments(docs: DataFrame, idCol: Column, segsCol: Column,
                    boiler: DataFrame, sep: String = "\n"): DataFrame = {
    val bh = broadcast(
      boiler.select(xxhash64(col("segment")).as("__bh")).distinct())
    val ex = docs.select(idCol.as("id"),
      posexplode(segsCol).as(Seq("__pos", "__seg")))
    val kept = ex.join(bh, xxhash64(col("__seg")) === col("__bh"), "left_anti")
    val re = kept
      .groupBy(col("id"))
      .agg(
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col("__pos").as("p"), col("__seg").as("s")))),
            x => x.getField("s"))).as("text_clean"),
        count(lit(1)).as("n_kept"))
    docs.select(idCol.as("id"), size(segsCol).cast(LongType).as("__n"))
      .join(re, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  // ---- Incremental frequency state -----------------------------------------

  /** Append one batch's segment frequencies to a persisted state dir.
    * Document frequency is ADDITIVE over batches with disjoint doc ids
    * (the ingest contract every incremental path here shares), so a
    * commit writes O(batch) rows and never reads existing state — the
    * StateStore delta posture. Readers aggregate on read; an atomic
    * versioned-commit wrapper (StateStore.commitDelta's pattern)
    * applies unchanged if concurrent readers need isolation.
    *
    * `batchId` names the batch in every delta row: a retried/duplicate
    * append of the same batch is then DETECTABLE and neutralized at
    * read time ([[frequenciesFromState]] collapses per (batch_id,
    * segment) before summing), instead of silently double-counting
    * document frequency. */
  def appendFrequencies(batch: DataFrame, idCol: Column, segsCol: Column,
                        dir: String, batchId: String): Unit =
    segmentFrequencies(batch, idCol, segsCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir)

  /** Corpus-wide frequencies from the accumulated deltas: one
    * aggregation over the state table (segment-vocabulary-sized, far
    * below corpus scale) — batch ingest reads ZERO corpus text.
    * Re-appended batches collapse to one contribution per (batch_id,
    * segment) — `max` is exact because duplicate appends of one batch
    * write identical counts. */
  def frequenciesFromState(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("batch_id"), col("segment"))
      .agg(max(col("n_docs")).as("__n"))
      .groupBy(col("segment"))
      .agg(sum(col("__n")).as("n_docs"))

  // ---- Registered queries --------------------------------------------------

  private val W = 2     // token-segment width on the newline-free tables
  private val TOP = 100 // scrub set = the 100 most document-frequent segments

  /** §2.11 — the Zipf head: top-100 segments by document frequency.
    *
    * Segments come from the row-exploded codegen path, not the
    * [[fixedTokenSegments]] Column: `transform`+`slice` HOF lambdas
    * evaluate INTERPRETED per segment, and the whole build ran inside
    * the one scan task of a single-row-group input. tokenLeadRows
    * (array indexing at explode time, whole-stage codegen) over
    * doc_id-spread text rows builds the identical segment multiset —
    * stride-w positions, concat_ws skipping the NULL tail leads
    * reproduces the short remainder, and an empty doc's [''] word
    * array still yields its one '' segment. The within-doc dedup that
    * array_distinct did pre-explode becomes a (doc, segment) distinct
    * — two map-side-combined exchanges instead of one exchange + an
    * interpreted per-doc lambda chain. */
  def frequentLinesQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val segRows = TextFunctions.tokenLeadRows(
        docs.repartition(col("doc_id")), Seq(col("doc_id")), col("text"), W)
      .filter(pmod(col("__pos"), lit(W)) === 0)
      .select(col("doc_id"),
        concat_ws(" ", (col("__w") +: (1 until W).map(i => col(s"__l$i"))): _*)
          .as("segment"))
    topSegments(
      segRows.distinct().groupBy(col("segment")).agg(count(lit(1)).as("n_docs")),
      TOP)
      .orderBy(col("n_docs").desc, col("segment"))
  }

  /** §2.11 — every document scrubbed of the top-100 frequent segments. */
  def lineScrubQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val segs = fixedTokenSegments(col("text"), W)
    val boiler = topSegments(
      segmentFrequencies(docs, col("doc_id"), segs), TOP)
    scrubSegments(docs, col("doc_id"), segs, boiler, sep = " ")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_frequent_lines" -> (frequentLinesQ _),
    "q_line_scrub"     -> (lineScrubQ _),
  )

  /** Shared oracle prelude: per-doc word array and width-2 segments
    * (mirrors fixedTokenSegments over the normalized text). */
  private val segSql =
    """w AS (SELECT doc_id,
      |        regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      |      FROM documents),
      |segs AS (
      |  SELECT doc_id, u.i AS pos, array_to_string(ws[2*u.i+1:2*u.i+2], ' ') AS seg
      |  FROM w, LATERAL (SELECT unnest(range(0, CAST(ceil(len(ws)/2.0) AS BIGINT))) AS i) u),
      |freq AS (
      |  SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY seg),
      |boiler AS (
      |  SELECT seg FROM freq ORDER BY n_docs DESC, seg LIMIT 100)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_frequent_lines" ->
      s"""WITH $segSql
         |SELECT f.seg AS segment, CAST(f.n_docs AS BIGINT) AS n_docs
         |FROM freq f JOIN boiler b ON f.seg = b.seg
         |ORDER BY n_docs DESC, segment""".stripMargin,

    // membership by segment string == membership by 64-bit hash
    // (collision-free at sf); docs losing every segment keep an empty
    // text_clean row
    "q_line_scrub" ->
      s"""WITH $segSql,
         |kept AS (
         |  SELECT s.doc_id, s.pos, s.seg FROM segs s
         |  WHERE s.seg NOT IN (SELECT seg FROM boiler)),
         |re AS (
         |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text_clean,
         |         count(*) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |n AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
         |SELECT n.doc_id AS doc_id, COALESCE(re.text_clean, '') AS text_clean,
         |       CAST(n.n_segs - COALESCE(re.n_kept, 0) AS BIGINT) AS n_removed
         |FROM n LEFT JOIN re ON n.doc_id = re.doc_id
         |ORDER BY n.doc_id""".stripMargin,
  )
}
