package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions
import graft.plans.BpeMergePair.bpe_merge_pair
import graft.sources.Tables

/** Byte-pair-encoding tokenizer induction + encoding (SURVEY.md §2 row
  * 116) — the Sennrich et al. 2016 recipe: repeatedly merge the
  * corpus's most frequent adjacent symbol pair. This is the tokenizer-
  * TRAINING step that sits in front of row 112's vocabulary id-ization
  * in a real LLM data pipeline (counts → merges → subword vocab).
  *
  * Scale shape (100 TB): everything after the first aggregation runs
  * on the DISTINCT-WORD frequency table — vocabulary-sized, orders of
  * magnitude smaller than the corpus (the classic BPE trainer layout).
  * Each merge iteration is one map-side-combined pair count over that
  * table plus a driver top-1 (two strings — bounded driver model);
  * symbol state advances through the codegen'd [[graft.plans.BpeMergePair]]
  * scan and is re-persisted per iteration, so iteration i never
  * replays iterations 1..i-1. ENCODING re-derives each distinct
  * word's pieces once (a chain of `numMerges` codegen'd merge scans —
  * no per-row interpretation) and reaches the corpus through one
  * equi-join on the word plus the inherent doc-keyed reassembly
  * shuffle (the row-112 idize layout).
  *
  * Determinism/oracle: pair ranking breaks ties on (a, b) byte order;
  * the greedy merge scan is replayed in DuckDB by a `list_reduce`
  * merge-or-append fold (equivalent because a merged token is strictly
  * longer than its left part — see BpeMergePair's scaladoc), so BOTH
  * the learned merge table (q_bpe_merges) and the encoded corpus
  * (q_bpe_encode) replay exactly, unrolled per iteration. */
object BpeOps {

  /** Single-codepoint symbol split. `(?s).` — not bare `.` — so BOTH
    * engines match EVERY codepoint: Java's `.` excludes U+0085,
    * U+2028 and U+2029 (which `normalize`'s \\s+ does NOT strip)
    * while RE2's excludes only \\n; a bare dot would silently drop
    * such chars on one side, breaking the lossless-encoding contract
    * AND cross-engine parity. */
  def charSymbols(w: Column): Column = regexp_extract_all(w, lit("(?s)."), lit(0))

  /** The distinct-word frequency table — the trainer's working set. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of `syms` weighted by `freq`, summed:
    * (a, b, cnt). Runs over the vocab frame only. */
  private def pairCounts(wf: DataFrame): DataFrame = {
    val m = greatest(size(col("syms")) - 1, lit(0))
    wf.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), m), slice(col("syms"), lit(2), m),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Learn up to `numMerges` merges (fewer if pairs run dry). */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= 256,
      s"numMerges must be in [1, 256], got $numMerges")
    var wf = wordFreqs(docs, textCol)
      .select(col("freq"), charSymbols(col("w")).as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE job per merge, not two: iteration i's top-1 collect is also
    // the job that materializes state i's persist (from state i-1's
    // still-live cache); only THEN is state i-1 dropped. The previous
    // shape ran a separate count() per iteration purely to materialize
    // — at numMerges=256 that is 256 extra job boundaries, and job
    // cadence is exactly what the round-12 bench regression punished.
    var parent: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var done = false
      while (merges.size < numMerges && !done) {
        val top = pairCounts(wf)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        // wf is materialized now; its parent's cache is no longer read
        if (parent != null) { parent.unpersist(); parent = null }
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          val next = wf.withColumn("syms", bpe_merge_pair(col("syms"), a, b))
            .persist(StorageLevel.MEMORY_AND_DISK)
          parent = wf
          wf = next
        }
      }
      merges.toSeq
    } finally {
      if (parent != null) { parent.unpersist(); () }
      wf.unpersist(); ()
    }
  }

  /** Encode every document: (idCol, pieces: array<string>) — the
    * distinct-word table pays the merge chain once; the corpus pays
    * one word join + the positional reassembly. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val pieceCol = merges.foldLeft(charSymbols(col("w"))) {
      (c, m) => bpe_merge_pair(c, m._1, m._2)
    }
    val docWords = docs.select(col(idCol).as("__id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("__pos", "w")))
      .filter(length(col("w")) > 0)
    val vocab = docWords.select(col("w")).distinct().withColumn("__pieces", pieceCol)
    docWords.join(vocab, Seq("w"))
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__pieces")))),
        x => x.getField("__pieces"))).as("pieces"))
      .select(col("__id").as(idCol), col("pieces"))
  }

  // ---- registered queries --------------------------------------------------

  private[operators] val NumMerges = 6

  /** Iteration-0 pair statistics: top-20 weighted adjacent char pairs. */
  def bpePairsQ(s: SparkSession, d: String): DataFrame = {
    val wf = wordFreqs(Tables.documents(s, d), "text")
      .select(col("freq"), charSymbols(col("w")).as("syms"))
    pairCounts(wf)
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("cnt").desc, col("a"), col("b"))).cast(LongType))
      .filter(col("rn") <= 20)
      .select(col("rn"), col("a"), col("b"), col("cnt"))
      .orderBy(col("rn"))
  }

  /** The learned merge table itself. */
  def bpeMergesQ(s: SparkSession, d: String): DataFrame = {
    val s2 = s; import s2.implicits._
    learnMerges(Tables.documents(s, d), "text", NumMerges)
      .zipWithIndex
      .map { case ((a, b), i) => (i + 1L, a, b) }
      .toDF("rank", "a", "b")
      .orderBy(col("rank"))
  }

  /** The encoded corpus (piece count + a 12-piece head per doc). */
  def bpeEncodeQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = learnMerges(docs, "text", NumMerges)
    encode(docs, "doc_id", "text", merges)
      .select(col("doc_id"), size(col("pieces")).cast(LongType).as("n_pieces"),
        concat_ws(" ", slice(col("pieces"), 1, 12)).as("head"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_pairs"  -> (bpePairsQ _),
    "q_bpe_merges" -> (bpeMergesQ _),
    "q_bpe_encode" -> (bpeEncodeQ _),
  )

  // ---- oracles -------------------------------------------------------------

  /** Normalized non-empty words of `documents` (the shingle oracle's
    * derivation + the trainer's empty-word filter). */
  private[operators] val wordsSql =
    """SELECT doc_id, u.pos AS pos, u.w AS w
      |FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
      |        i -> struct_pack(pos := i, w := ws[CAST(i AS INT)]))) AS u
      |      FROM (SELECT doc_id,
      |              regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      |            FROM documents) _w) _u
      |WHERE u.w <> ''""".stripMargin

  /** Greedy merge replay: list_reduce merge-or-append over
    * singleton-wrapped symbols (see BpeMergePair scaladoc). `m` must
    * be a 1-row relation in scope providing a/b. */
  private[operators] def mergeSql(syms: String, m: String) =
    s"""list_reduce(
       |  list_prepend(CAST([] AS VARCHAR[]), list_transform($syms, s -> [s])),
       |  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $m.a AND x[1] = $m.b
       |              THEN list_append(acc[1:len(acc)-1], $m.a || $m.b)
       |              ELSE list_concat(acc, x) END)""".stripMargin

  /** Pair counts over symbol state `$s` → CTE `$p` (a, b, cnt). */
  private def pairSql(p: String, s: String) =
    s"""$p AS (
       |  SELECT u.a AS a, u.b AS b, SUM(freq) AS cnt FROM (
       |    SELECT freq, unnest(list_transform(range(1, len(syms)),
       |      i -> struct_pack(a := syms[CAST(i AS INT)], b := syms[CAST(i AS INT) + 1]))) AS u
       |    FROM $s) _pairs
       |  GROUP BY u.a, u.b)""".stripMargin

  /** One unrolled trainer iteration: top pair of `$prev` → merge CTE
    * `m$i` → next symbol state `s$i`. `m$i` is GUARANTEED one row: if
    * the pair table runs dry a (NULL, NULL) sentinel takes its place,
    * under which the merge CASE never fires (NULL comparisons) — the
    * CROSS JOINs degrade to no-ops instead of annihilating the
    * relation, mirroring Spark's early loop exit. */
  private def iterSql(i: Int): String = {
    val prev = s"s${i - 1}"
    s"""${pairSql(s"p$i", prev)},
       |m$i AS (
       |  SELECT a, b FROM (
       |    SELECT a, b, 0 AS pri
       |    FROM (SELECT a, b FROM p$i ORDER BY cnt DESC, a, b LIMIT 1) _top
       |    UNION ALL SELECT NULL, NULL, 1) _u
       |  ORDER BY pri LIMIT 1),
       |s$i AS MATERIALIZED (
       |  SELECT freq, ${mergeSql("syms", "m")} AS syms
       |  FROM $prev CROSS JOIN m$i m)""".stripMargin
  }

  /** Shared trainer prefix: words → word freqs → char symbols → 6
    * unrolled merge iterations. */
  private[operators] def trainerSql: String =
    s"""w0 AS (SELECT w FROM ($wordsSql) _all),
       |wf AS (SELECT w, COUNT(*) AS freq FROM w0 GROUP BY w),
       |s0 AS MATERIALIZED (SELECT freq, regexp_extract_all(w, '(?s).') AS syms FROM wf),
       |${(1 to NumMerges).map(iterSql).mkString(",\n")}""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bpe_pairs" ->
      s"""WITH w0 AS (SELECT w FROM ($wordsSql) _all),
         |wf AS (SELECT w, COUNT(*) AS freq FROM w0 GROUP BY w),
         |s0 AS (SELECT freq, regexp_extract_all(w, '(?s).') AS syms FROM wf),
         |${pairSql("p1", "s0")}
         |SELECT rn, a, b, CAST(cnt AS BIGINT) AS cnt FROM (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rn,
         |    a, b, cnt
         |  FROM p1) t
         |WHERE rn <= 20
         |ORDER BY rn""".stripMargin,

    // the NULL sentinel rows of dry iterations are filtered out —
    // Spark's merge list simply ends early
    "q_bpe_merges" ->
      s"""WITH $trainerSql
         |SELECT CAST(rank AS BIGINT) AS rank, a, b FROM (
         |${(1 to NumMerges).map(i => s"  SELECT $i AS rank, a, b FROM m$i")
            .mkString("\n  UNION ALL\n")}) _m
         |WHERE a IS NOT NULL
         |ORDER BY rank""".stripMargin,

    // the encoder: every DISTINCT word through the 6 chained merge
    // folds, corpus reassembled by (doc, pos)
    "q_bpe_encode" -> {
      val chain = (1 to NumMerges).foldLeft("regexp_extract_all(w, '(?s).')") {
        (acc, i) => mergeSql(acc, s"mm$i")
      }
      s"""WITH $trainerSql,
         |enc AS MATERIALIZED (
         |  SELECT w, $chain AS pieces
         |  FROM (SELECT DISTINCT w FROM ($wordsSql) _d) _v
         |  ${(1 to NumMerges).map(i => s"CROSS JOIN m$i mm$i").mkString(" ")}),
         |docw AS ($wordsSql)
         |SELECT doc_id,
         |  CAST(len(allp) AS BIGINT) AS n_pieces,
         |  array_to_string(allp[1:12], ' ') AS head
         |FROM (
         |  SELECT d.doc_id, flatten(list(e.pieces ORDER BY d.pos)) AS allp
         |  FROM docw d JOIN enc e ON d.w = e.w
         |  GROUP BY d.doc_id) _g
         |ORDER BY doc_id""".stripMargin
    },
  )
}
