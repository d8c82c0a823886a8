package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Tokenizer fertility / compression eval (SURVEY.md §2 row 238) —
  * the operating comparison between the row-116 BPE and the row-236
  * unigram tokenizer on the SAME corpus: fertility (pieces per word),
  * compression (chars per piece) and the single-char-piece share
  * (the "fallback rate" — how often the tokenizer degenerates to
  * characters). These three numbers are how a vocab budget is chosen
  * before a training run; reported as exact ppm floor divisions
  * (integer wires, one pinned division nowhere — all ppm).
  *
  * Scale shape: everything aggregates over the DISTINCT-WORD frame
  * weighted by corpus frequency — the corpus is never re-exploded;
  * both tokenizers already pay their per-distinct-word transform
  * (merge chain / Viterbi), so the eval adds one weighted aggregation
  * each. */
object TokEval {

  private def metrics(tag: String, seg: DataFrame): DataFrame =
    seg.agg(
      sum(col("freq")).as("n_words"),
      sum(col("freq") * length(col("w"))).as("n_chars"),
      sum(col("freq") * size(col("pieces"))).as("n_pieces"),
      sum(col("freq") * size(filter(col("pieces"), p => length(p) === 1)))
        .as("n_single"))
    .select(lit(tag).as("tokenizer"),
      col("n_words").cast(LongType).as("n_words"),
      col("n_chars").cast(LongType).as("n_chars"),
      col("n_pieces").cast(LongType).as("n_pieces"),
      col("n_single").cast(LongType).as("n_single"))

  private def withPpm(df: DataFrame): DataFrame =
    df.select(col("tokenizer"), col("n_words"), col("n_chars"),
      col("n_pieces"), col("n_single"),
      GraphOps.fdiv(col("n_pieces") * 1000000L, col("n_words")).as("fertility_ppm"),
      GraphOps.fdiv(col("n_chars") * 1000000L, col("n_pieces")).as("chars_per_piece_ppm"),
      GraphOps.fdiv(col("n_single") * 1000000L, col("n_pieces")).as("single_ppm"))

  /** §2 row 238 — both tokenizers' corpus fertility, one row each. */
  def tokFertilityQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val wf = UnigramTok.wordFreqs(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // BPE: the learned merge chain applied to each distinct word
    val merges = BpeOps.learnMerges(docs, "text", BpeOps.NumMerges)
    val bpeCol = merges.foldLeft(BpeOps.charSymbols(col("w"))) {
      (c, m) => graft.plans.BpeMergePair.bpe_merge_pair(c, m._1, m._2)
    }
    val bpeSeg = wf.withColumn("pieces", bpeCol)
    // unigram: one-EM-round vocab, Viterbi per distinct word
    val uniSeg = UnigramTok.segmentWords(
      wf, UnigramTok.train(docs, "text", iters = 1), UnigramTok.DefaultMaxPiece)
    withPpm(metrics("bpe", bpeSeg).unionByName(metrics("unigram", uniSeg)))
      .orderBy(col("tokenizer"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tok_fertility" -> (tokFertilityQ _))

  /** Each tokenizer's full trainer+encoder replay runs in its own
    * subquery scope (CTE names collide across the two pipelines), and
    * the two metric rows union. */
  val oracles: Map[String, String] = Map(
    "q_tok_fertility" -> {
      val bpeChain = (1 to BpeOps.NumMerges)
        .foldLeft("regexp_extract_all(w, '(?s).')") {
          (acc, i) => BpeOps.mergeSql(acc, s"mm$i")
        }
      s"""SELECT tokenizer, n_words, n_chars, n_pieces, n_single,
         |  n_pieces * 1000000 // n_words AS fertility_ppm,
         |  n_chars * 1000000 // n_pieces AS chars_per_piece_ppm,
         |  n_single * 1000000 // n_pieces AS single_ppm
         |FROM (
         |  SELECT * FROM (
         |    WITH ${BpeOps.trainerSql},
         |    enc AS MATERIALIZED (
         |      SELECT w, $bpeChain AS pieces
         |      FROM (SELECT DISTINCT w FROM (${BpeOps.wordsSql}) _d) _v
         |      ${(1 to BpeOps.NumMerges).map(i => s"CROSS JOIN m$i mm$i").mkString(" ")})
         |    SELECT 'bpe' AS tokenizer,
         |      CAST(SUM(wf.freq) AS BIGINT) AS n_words,
         |      CAST(SUM(wf.freq * len(wf.w)) AS BIGINT) AS n_chars,
         |      CAST(SUM(wf.freq * len(e.pieces)) AS BIGINT) AS n_pieces,
         |      CAST(SUM(wf.freq * len(list_filter(e.pieces, p -> len(p) = 1))) AS BIGINT) AS n_single
         |    FROM wf JOIN enc e ON wf.w = e.w)
         |  UNION ALL
         |  SELECT * FROM (
         |    WITH ${UnigramTok.trainSql},
         |    ${UnigramTok.segSql("b", "vm1", "segB")}
         |    SELECT 'unigram' AS tokenizer,
         |      CAST(SUM(freq) AS BIGINT) AS n_words,
         |      CAST(SUM(freq * len(w)) AS BIGINT) AS n_chars,
         |      CAST(SUM(freq * len(ps)) AS BIGINT) AS n_pieces,
         |      CAST(SUM(freq * len(list_filter(ps, p -> len(p) = 1))) AS BIGINT) AS n_single
         |    FROM segB))
         |ORDER BY tokenizer""".stripMargin
    })
}
