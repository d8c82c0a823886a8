package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TextFunctions
import graft.sources.Tables

/** SentencePiece-style unigram tokenizer (SURVEY.md §2 row 236) — the
  * standard alternative to the row-116 BPE trainer (Kudo 2018): a
  * piece VOCABULARY with scores, hard-EM refined, and Viterbi
  * segmentation that picks the best whole-word decomposition (BPE
  * greedily merges; unigram globally optimizes per word).
  *
  * Integer image (the BPE/chi²/kappa exactness discipline): piece
  * score = bitlen(count) (= floor(log2)+1 via `length(bin(n))`,
  * exact in both engines), Viterbi MINIMIZES Σ (64 − score(piece)) —
  * the quantized −log₂ p objective up to the per-piece constant; an
  * out-of-vocab character costs the full 64. Ties break by fewer
  * pieces, then longest-first piece — a total, replayable order.
  * No ln(), no doubles anywhere.
  *
  * Hard EM: segment the distinct-word table under the seed scores
  * (all substrings ≤ maxPiece chars, frequency-weighted; chars always
  * in), recount piece usage from the CHOSEN segmentations, re-score
  * by usage — the Viterbi-counts E-step/M-step pair, `iters` rounds.
  *
  * Scale shape (100 TB): the corpus collapses to the distinct-word
  * frame once (map-side combined freq); every EM pass and the final
  * encode segment ONLY distinct words — the corpus pays one word
  * equi-join + the positional reassembly (the BPE encode pattern).
  * The vocabulary is a 1-row broadcast map (vocabSize-bounded);
  * seed-vocab selection is orderBy+limit = TakeOrderedAndProject
  * (distributed top-K, never a global sort). The per-word DP is a
  * pure `aggregate` higher-order projection: no shuffle, no UDF, no
  * driver loop. Oracle replay unrolls the DP to `OracleMaxWordLen`
  * chars (corpus max is 8); longer words are engine-correct (the
  * aggregate runs to any length) and spec-covered. */
object UnigramTok {

  /** Max piece length in characters (DP fan-in per position). */
  val DefaultMaxPiece = 4

  /** Word-length bound the SQL oracle unrolls to (engine itself is
    * unbounded). Enforced LOUDLY in the oracle: a corpus word longer
    * than this makes the oracle's wf CTE raise a cast error naming
    * the breach, instead of returning NULL pieces that would surface
    * as a confusing value mismatch. */
  val OracleMaxWordLen = 12

  /** Corpus word frequencies over the normalized word stream. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Frequency-weighted counts of every substring piece of length
    * 1..maxPiece across the distinct-word table. */
  def substringCounts(wf: DataFrame, maxPiece: Int): DataFrame =
    wf.select(col("freq"), col("w"), length(col("w")).as("__L"))
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(0), col("__L") - 1), i =>
          transform(sequence(lit(1), least(lit(maxPiece), col("__L") - i)), d =>
            col("w").substr(i + 1, d))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** bitlen(n) = length(bin(n)): the exact integer log image. */
  private def bitlen(c: Column): Column = length(bin(c)).cast(LongType)

  /** Seed vocabulary: every single char (coverage) + the top
    * `vocabSize` multi-char substrings by (count DESC, piece ASC).
    * Returns (piece, cnt, sc). */
  def seedVocab(wf: DataFrame, maxPiece: Int, vocabSize: Int): DataFrame = {
    val subs = substringCounts(wf, maxPiece)
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    chars.unionByName(multi)
      .select(col("piece"), col("cnt"), bitlen(col("cnt")).as("sc"))
  }

  /** Backward Viterbi DP over one word under the broadcast score map:
    * entry m (1-based) holds (cost, k, d) for position L−m+1 — the
    * minimal suffix cost, its piece count, and the chosen first-piece
    * length. Candidate order (cost ASC, k ASC, −d ASC) = cheapest,
    * then fewest pieces, then longest first piece. */
  private def dpCol(w: Column, vmap: Column, maxPiece: Int): Column = {
    val L = length(w)
    aggregate(
      sequence(lit(1), L),
      array(struct(lit(0L).as("cost"), lit(0L).as("k"), lit(0L).as("d"))),
      (acc, t) => {
        val i = L - t
        val cands = filter(
          transform(sequence(lit(1), least(lit(maxPiece), t)), d => {
            val piece = w.substr(i + 1, d)
            val sc = element_at(vmap, piece)
            val prev = element_at(acc, t - d + 1)
            val stepCost = when(sc.isNotNull, lit(64L) - sc)
              .otherwise(when(d === 1, lit(64L)))
            when(stepCost.isNotNull,
              struct((prev.getField("cost") + stepCost).as("cost"),
                (prev.getField("k") + 1L).as("k"),
                (-d).cast(LongType).as("dn")))
          }),
          c => c.isNotNull)
        val best = array_min(cands)
        concat(acc, array(struct(
          best.getField("cost").as("cost"),
          best.getField("k").as("k"),
          (-best.getField("dn")).as("d"))))
      })
  }

  /** Forward walk over the DP: emit the chosen pieces in order. */
  private def walkCol(w: Column, dp: Column): Column = {
    val L = length(w)
    aggregate(
      sequence(lit(1), L),
      struct(lit(0).as("p"), typedLit(Seq.empty[String]).as("ps")),
      (st, _) => {
        val p = st.getField("p")
        val d = element_at(dp, L - p + 1).getField("d").cast(IntegerType)
        when(p >= L, st).otherwise(
          struct((p + d).as("p"),
            concat(st.getField("ps"), array(w.substr(p + 1, d))).as("ps")))
      },
      st => st.getField("ps"))
  }

  /** Viterbi-segment every row's `w` under `vocab(piece, sc)`,
    * retaining all input columns and adding pieces / n_pieces /
    * cost. The vocabulary travels as a 1-row broadcast map. */
  def segmentWords(words: DataFrame, vocab: DataFrame, maxPiece: Int): DataFrame = {
    val vm = vocab.agg(map_from_entries(
      collect_list(struct(col("piece"), col("sc")))).as("__vm"))
    val inCols = words.columns.map(col).toSeq
    words.crossJoin(broadcast(vm))
      .withColumn("__dp", dpCol(col("w"), col("__vm"), maxPiece))
      .withColumn("pieces", walkCol(col("w"), col("__dp")))
      .select(inCols ++ Seq(col("pieces"),
        size(col("pieces")).cast(LongType).as("n_pieces"),
        element_at(col("__dp"), length(col("w")) + 1)
          .getField("cost").as("cost")): _*)
  }

  /** One hard-EM round: segment the distinct-word table under the
    * current scores, recount frequency-weighted piece USAGE from the
    * chosen segmentations, re-score by usage. Unused pieces drop out
    * (chars included — the OOV char fallback keeps coverage). */
  def refineVocab(wf: DataFrame, vocab: DataFrame, maxPiece: Int): DataFrame =
    segmentWords(wf, vocab, maxPiece)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .select(col("piece"), col("cnt"), bitlen(col("cnt")).as("sc"))

  /** Seed + `iters` hard-EM rounds. Returns (piece, cnt, sc). */
  def train(docs: DataFrame, textCol: String,
            maxPiece: Int = DefaultMaxPiece, vocabSize: Int = 256,
            iters: Int = 1): DataFrame = {
    require(iters >= 0 && iters <= 8, s"iters must be in [0, 8], got $iters")
    val wf = wordFreqs(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (1 to iters).foldLeft(seedVocab(wf, maxPiece, vocabSize)) {
      (v, _) => refineVocab(wf, v, maxPiece)
    }
  }

  /** Encode every document under a trained vocabulary: the distinct
    * words pay the DP once, the corpus pays one equi-join + the
    * positional reassembly; the doc spine keeps word-free rows. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, maxPiece: Int = DefaultMaxPiece): DataFrame = {
    val docWords = docs.select(col(idCol).cast(LongType).as("__id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("__pos", "w")))
      .filter(length(col("w")) > 0)
    val seg = segmentWords(docWords.select(col("w")).distinct(), vocab, maxPiece)
      .select(col("w"), col("pieces"))
    val perDoc = docWords.join(seg, Seq("w"))
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("pieces")))),
        x => x.getField("pieces"))).as("ps"))
    docs.select(col(idCol).cast(LongType).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(size(col("ps")), lit(0)).cast(LongType).as("n_pieces"),
        coalesce(array_join(col("ps"), " "), lit("")).as("pieces_text"))
  }

  // ---- registered queries --------------------------------------------------

  private val VocabSize = 256

  /** §2 row 236 — the vocabulary after one hard-EM round. */
  def unigramVocabQ(s: SparkSession, d: String): DataFrame =
    train(Tables.documents(s, d), "text", iters = 1)
      .orderBy(col("piece"))

  /** §2 row 236 — the corpus encoded under that vocabulary. */
  def unigramEncodeQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    encode(docs, "doc_id", "text", train(docs, "text", iters = 1))
      .orderBy(col("doc_id"))
  }

  /** The pinned WordPiece vocab for q_wordpiece (SURVEY.md §2 row
    * 297): all [a-z0-9] single characters in both start and
    * continuation forms (so corpus tokens never UNK — UNK itself is
    * spec-pinned), plus multi-char start/## pieces chosen to segment
    * the synthetic corpus's frequent words non-trivially. A LITERAL,
    * not a learned table: the operator takes any vocab; the pinned
    * one keeps both engines' derivation byte-identical. */
  private[operators] val WordPieceVocab: Seq[String] = {
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    chars ++ chars.map("##" + _) ++ Seq(
      "ta", "##ble", "sc", "##an", "fa", "##st", "spark", "wind", "##ow",
      "mer", "##ge", "ba", "##tch", "val", "##ue", "cust", "##omer",
      "qu", "##ery", "the", "##er", "##s", "gr", "##oup", "fil", "##ter")
  }

  /** §2 row 297 — greedy WordPiece over the corpus's distinct regex
    * tokens: (word, pieces, n_pieces), the MaxMatch complement of the
    * BPE and Viterbi encoders. Distinct-word-bounded (the BPE trainer
    * layout): the corpus never pays per-occurrence encoding. */
  def wordPieceQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("w"))
      .distinct()
      .withColumn("pieces", graft.plans.WordPieceEncode.word_piece(
        col("w"), WordPieceVocab))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      // the gate harness sorts columns in pandas, which cannot order
      // list values — emit the joined string, not the ARRAY (the
      // q_unigram_encode output shape)
      .withColumn("pieces_text", array_join(col("pieces"), " "))
      .drop("pieces")
      .orderBy(col("w"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_vocab"  -> (unigramVocabQ _),
    "q_unigram_encode" -> (unigramEncodeQ _),
    "q_wordpiece"      -> (wordPieceQ _))

  // ---- oracle --------------------------------------------------------------

  private[operators] val P = DefaultMaxPiece
  private val W = OracleMaxWordLen

  /** Candidate list for DP step t under map column `m`: the SQL twin
    * of the dpCol lambda (struct field order carries the tiebreak). */
  private def candsSql(t: Int): String =
    s"""[{'cost': dp[$t - d + 1]['cost'] +
       |    64 - COALESCE(m[substr(w, len - $t + 1, d)][1],
       |                  CASE WHEN d = 1 THEN 0 END),
       |  'k': dp[$t - d + 1]['k'] + 1,
       |  'dn': -CAST(d AS BIGINT)}
       |  FOR d IN range(1, least($P, $t) + 1)
       |  IF d = 1 OR m[substr(w, len - $t + 1, d)][1] IS NOT NULL]"""
      .stripMargin.replace("\n", " ")

  /** Unrolled backward DP + forward walk under map CTE `vm`, over the
    * word CTE `wf(w, freq)`; emits CTE `$out(w, freq, ps)`. */
  private[operators] def segSql(tag: String, vmCte: String, out: String): String = {
    val dp = (1 to W).map { t =>
      s"""${tag}d$t AS (
         |  SELECT w, freq, len, CASE WHEN $t > len THEN dp
         |    ELSE list_append(dp, {'cost': b['cost'], 'k': b['k'],
         |                          'd': -b['dn']}) END AS dp
         |  FROM (SELECT w, freq, len, dp, list_min(${candsSql(t)}) AS b
         |        FROM ${tag}d${t - 1}, $vmCte))""".stripMargin
    }.mkString(",\n")
    val wk = (1 to W).map { t =>
      s"""${tag}w$t AS (
         |  SELECT w, freq, len, dp,
         |    CASE WHEN p >= len THEN p
         |      ELSE p + dp[len - p + 1]['d'] END AS p,
         |    CASE WHEN p >= len THEN ps
         |      ELSE list_append(ps, substr(w, CAST(p + 1 AS INT),
         |        CAST(dp[len - p + 1]['d'] AS INT))) END AS ps
         |  FROM ${tag}w${t - 1})""".stripMargin
    }.mkString(",\n")
    s"""${tag}d0 AS (
       |  SELECT w, freq, len(w) AS len,
       |    [{'cost': CAST(0 AS BIGINT), 'k': CAST(0 AS BIGINT),
       |      'd': CAST(0 AS BIGINT)}] AS dp
       |  FROM wf),
       |$dp,
       |${tag}w0 AS (
       |  SELECT w, freq, len, dp, 0 AS p, CAST([] AS VARCHAR[]) AS ps
       |  FROM ${tag}d$W),
       |$wk,
       |$out AS (SELECT w, freq, ps FROM ${tag}w$W)""".stripMargin
  }

  /** Shared front: normalized word stream, freqs, seed vocab, EM
    * round, final vocab CTE `vocab1(piece, cnt, sc)`. */
  private[operators] val trainSql: String =
    s"""ws AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, wl[i+1] AS w
       |  FROM (SELECT doc_id,
       |          regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS wl
       |        FROM documents) t,
       |    LATERAL (SELECT unnest(range(0, len(wl))) AS i) _i
       |  WHERE len(wl[i+1]) > 0),
       |wf0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM ws GROUP BY w),
       |wf AS (
       |  SELECT w, freq FROM wf0
       |  WHERE (SELECT CASE WHEN COALESCE(max(len(w)), 0) <= $W THEN 1
       |         ELSE CAST('ORACLE BOUND BREACH: corpus word longer than OracleMaxWordLen=$W chars - the unrolled DP cannot replay it' AS BIGINT)
       |         END FROM wf0) = 1),
       |subs AS (
       |  SELECT substr(w, CAST(i + 1 AS INT), CAST(d AS INT)) AS piece,
       |    SUM(freq) AS cnt
       |  FROM wf,
       |    LATERAL (SELECT unnest(range(0, len(w))) AS i) _i,
       |    LATERAL (SELECT unnest(range(1, least($P, len(w) - i) + 1)) AS d) _d
       |  GROUP BY 1),
       |vocab0 AS (
       |  SELECT piece, cnt, CAST(len(bin(cnt)) AS BIGINT) AS sc FROM subs
       |  WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt, CAST(len(bin(cnt)) AS BIGINT) AS sc FROM (
       |    SELECT piece, cnt,
       |      ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM subs WHERE len(piece) >= 2) r
       |  WHERE rn <= $VocabSize),
       |vm0 AS (SELECT map_from_entries(list({'k': piece, 'v': sc})) AS m FROM vocab0),
       |${segSql("a", "vm0", "segA")},
       |usage AS (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(ps) AS piece FROM segA)
       |  GROUP BY piece),
       |vocab1 AS (SELECT piece, cnt, CAST(len(bin(cnt)) AS BIGINT) AS sc FROM usage),
       |vm1 AS (SELECT map_from_entries(list({'k': piece, 'v': sc})) AS m FROM vocab1)"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    // the greedy MaxMatch replayed as a recursive CTE: per step the
    // longest vocab piece at pos is the first non-NULL of a
    // descending-length probe (range(n, 0, -1)); a gap collapses the
    // word to ['[UNK]'] and stops (pos := length). DuckDB length/
    // substr are code-point based, matching the Expression exactly.
    "q_wordpiece" -> {
      val v = WordPieceVocab.map(p => s"'$p'").mkString("[", ", ", "]")
      s"""WITH RECURSIVE words AS (
         |  SELECT DISTINCT w FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS w
         |    FROM documents) u),
         |h AS (
         |  SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM words
         |  UNION ALL
         |  SELECT w,
         |    CASE WHEN m IS NULL THEN length(w)
         |         ELSE pos + length(m) - CASE WHEN pos > 0 THEN 2 ELSE 0 END END,
         |    CASE WHEN m IS NULL THEN ['[UNK]'] ELSE list_append(pieces, m) END
         |  FROM (
         |    SELECT w, pos, pieces,
         |      (list_filter(list_transform(range(LEAST(8, length(w) - pos), 0, -1),
         |        L -> CASE WHEN list_contains($v,
         |            (CASE WHEN pos > 0 THEN '##' ELSE '' END)
         |              || substr(w, pos + 1, L))
         |          THEN (CASE WHEN pos > 0 THEN '##' ELSE '' END)
         |            || substr(w, pos + 1, L) END),
         |        x -> x IS NOT NULL))[1] AS m
         |    FROM h WHERE pos < length(w)) t)
         |SELECT w, CAST(len(pieces) AS BIGINT) AS n_pieces,
         |  list_aggregate(pieces, 'string_agg', ' ') AS pieces_text
         |FROM h
         |WHERE pos >= length(w)
         |ORDER BY w""".stripMargin
    },

    "q_unigram_vocab" ->
      s"""WITH $trainSql
         |SELECT piece, cnt, sc FROM vocab1 ORDER BY piece""".stripMargin,

    // second segmentation pass under the EM'd scores, then the
    // positional per-doc reassembly with the word-free doc spine
    "q_unigram_encode" ->
      s"""WITH $trainSql,
         |${segSql("b", "vm1", "segB")},
         |perdoc AS (
         |  SELECT ws.doc_id,
         |    CAST(SUM(len(s.ps)) AS BIGINT) AS n_pieces,
         |    string_agg(array_to_string(s.ps, ' '), ' ' ORDER BY ws.pos) AS pieces_text
         |  FROM ws JOIN segB s ON ws.w = s.w
         |  GROUP BY ws.doc_id)
         |SELECT d.doc_id,
         |  COALESCE(p.n_pieces, 0) AS n_pieces,
         |  COALESCE(p.pieces_text, '') AS pieces_text
         |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin)
}
