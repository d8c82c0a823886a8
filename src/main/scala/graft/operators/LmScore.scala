package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Unigram language-model quality scoring (SURVEY.md §2.5): per-doc
  * mean log-probability of its tokens under the corpus's own unigram
  * distribution — the classic cheap LM signal. Documents full of rare
  * garbage (OCR noise, random identifiers) score far below fluent text
  * because their tokens carry large negative log-probs; the score
  * complements the character-class and repetition gates, which such
  * text can pass.
  *
  * Shape: one token explode; vocab = one (token) aggregation;
  * per-doc = one (doc, token) aggregation, one equi-join vocab→tokens
  * on the token, one (doc) aggregation. All map-side-combinable hash
  * aggregations over high-cardinality keys — linear at any corpus
  * size, no driver state.
  *
  * `exact = false` (scale default) sums `c · ln p` with AVG-style
  * float accumulation — order depends on partitioning. `exact = true`
  * sorts each doc's (token, count) terms and folds them sequentially,
  * making the score a pure function of the document and vocabulary —
  * reproducible across runs and partitionings (the labelCentroids
  * pattern; spec-pinned). ln itself is NOT cross-engine replayable, so
  * the registered query is rows-only by design (SURVEY §5 note).
  */
object LmScore {

  /** (doc_id, n_tokens, avg_logprob). Probabilities are maximum
    * likelihood over the whole corpus; every doc token occurs at least
    * once in the vocab (the corpus contains the doc), so no smoothing
    * term is needed for finiteness. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                     exact: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextFunctions.words(col(textCol))).as("__w"))
    val vocab = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    // corpus token total as a 1-row broadcast (bounded driver state: none)
    val total = vocab.agg(sum(col("__c")).as("__n"))
    val withP = toks.groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("__k"))
      .join(vocab, Seq("__w"))
      .crossJoin(broadcast(total))
      .select(col("__id"), col("__w"), col("__k"),
        (log(col("__c").cast(DoubleType)) - log(col("__n").cast(DoubleType)))
          .as("__lp"))
    if (exact)
      withP.groupBy(col("__id"))
        .agg(sum(col("__k")).as("n_tokens"),
          sort_array(collect_list(struct(col("__w"), col("__k"), col("__lp")))).as("__ts"))
        .select(col("__id").as(idCol), col("n_tokens"),
          (aggregate(col("__ts"), lit(0.0),
            (acc, t) => acc + t.getField("__k").cast(DoubleType) * t.getField("__lp")) /
            col("n_tokens").cast(DoubleType)).as("avg_logprob"))
    else
      withP.groupBy(col("__id"))
        .agg(sum(col("__k")).as("n_tokens"),
          (sum(col("__k").cast(DoubleType) * col("__lp")) /
            sum(col("__k")).cast(DoubleType)).as("avg_logprob"))
        .withColumnRenamed("__id", idCol)
  }

  /** §2.5 — rows-only (ln is not oracle-replayable): deterministic via
    * the exact fold, emitted at 9 decimals so the value is stable to
    * read yet insensitive to last-ulp platform drift. */
  def unigramLogProbQ(s: SparkSession, d: String): DataFrame =
    unigramLogProb(Tables.documents(s, d), "doc_id", "text", exact = true)
      .select(col("doc_id"), col("n_tokens"),
        round(col("avg_logprob"), 9).as("avg_logprob"))
      .orderBy(col("doc_id"))

  // ---- Bigram LM (SURVEY.md §2 row 115) -----------------------------------

  /** Interpolated bigram language-model score (SURVEY.md §2 row 115):
    * per-doc mean log-probability where each non-initial token is
    * scored `λ·C(a,b)/C(a) + (1−λ)·C(b)/N` and the first token falls
    * back to its unigram probability — the KenLM-lite perplexity
    * filter (CCNet's curation signal) one rung above [[unigramLogProb]]:
    * it penalizes UNSEEN TRANSITIONS (word salad built from common
    * words sails through a unigram gate; its bigrams are all rare).
    * Interpolation (not backoff) keeps every probability strictly
    * positive without discounting bookkeeping.
    *
    * Shape: tokens explode once and feed BOTH count tables (unigram =
    * one hash agg; bigram = lead() over the per-DOC window — bounded
    * by doc length, never a corpus-wide sort); per-doc terms join the
    * two vocab tables on their keys (linear equi-joins, map-side
    * combinable aggs). The per-doc fold is the same sorted exact
    * reduction as the unigram path, so the score is a pure function
    * of (document, corpus) independent of partitioning. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.7): DataFrame = {
    require(lambda > 0d && lambda < 1d, s"lambda must be in (0,1), got $lambda")
    // ONE corpus tokenization + ONE per-doc lead() window feed every
    // consumer below (unigram counts, per-doc terms, first token,
    // token count): persisted, because Spark does not dedupe common
    // subplans — the ngramJaccard/tokenPass discipline. The corpus
    // bigram table derives from the PER-DOC term counts by one more
    // re-aggregation instead of a second pass over seq2.
    val seq2 = docs.select(col(idCol).as("__id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("__pos", "__a")))
      .withColumn("__b",
        lead(col("__a"), 1).over(Window.partitionBy(col("__id")).orderBy(col("__pos"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = seq2

    val uni = toks.groupBy(col("__a")).agg(count(lit(1)).as("__ca"))
    val total = uni.agg(sum(col("__ca")).as("__n"))
    val docTerms = seq2.filter(col("__b").isNotNull)
      .groupBy(col("__id"), col("__a"), col("__b")).agg(count(lit(1)).as("__k"))
    val big = docTerms.groupBy(col("__a"), col("__b")).agg(sum(col("__k")).as("__cab"))

    // per-doc bigram terms: k occurrences of transition (a, b)
    val terms = docTerms
      .join(big, Seq("__a", "__b"))
      .join(uni, Seq("__a"))
      .join(uni.select(col("__a").as("__b"), col("__ca").as("__cb")), Seq("__b"))
      .crossJoin(broadcast(total))
      .select(col("__id"), col("__a"), col("__b"), col("__k"),
        log(lit(lambda) * (col("__cab").cast(DoubleType) / col("__ca").cast(DoubleType))
          + lit(1d - lambda) * (col("__cb").cast(DoubleType) / col("__n").cast(DoubleType)))
          .as("__lp"))
    val folded = terms.groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__a"), col("__b"), col("__k"), col("__lp"))))
        .as("__ts"))
      .select(col("__id"),
        aggregate(col("__ts"), lit(0.0),
          (acc, t) => acc + t.getField("__k").cast(DoubleType) * t.getField("__lp"))
          .as("__bsum"))

    // first-token unigram term + token count per doc
    val firstTok = toks.filter(col("__pos") === 0)
      .join(uni, Seq("__a"))
      .crossJoin(broadcast(total))
      .select(col("__id"),
        (log(col("__ca").cast(DoubleType)) - log(col("__n").cast(DoubleType))).as("__lp1"))
    val nTok = toks.groupBy(col("__id")).agg(count(lit(1)).as("n_tokens"))

    nTok.join(firstTok, Seq("__id"))
      .join(folded, Seq("__id"), "left") // one-word docs have no bigrams
      .select(col("__id").as(idCol), col("n_tokens"),
        ((col("__lp1") + coalesce(col("__bsum"), lit(0.0))) /
          col("n_tokens").cast(DoubleType)).as("avg_logprob"))
  }

  /** §2 row 115 — rows-only (ln): 9-decimal deterministic emission,
    * the [[unigramLogProbQ]] posture. Its input statistics are
    * oracle-verified through q_top_bigrams. */
  def bigramLogProbQ(s: SparkSession, d: String): DataFrame =
    bigramLogProb(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("avg_logprob"), 9).as("avg_logprob"))
      .orderBy(col("doc_id"))

  /** §2 row 115 oracle anchor: top-10 word bigrams per language —
    * pins the tokenization + transition-count derivation the rows-only
    * score consumes (the q_top_tokens relationship, one n up). */
  def topBigramsQ(s: SparkSession, d: String): DataFrame =
    TextFunctions.shingleRows(Tables.documents(s, d),
        Seq(col("lang"), col("doc_id")), col("text"), n = 2, out = "bigram")
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bigram"))))
      .filter(col("rn") <= 10)
      .select(col("lang"), col("rn").cast(LongType).as("rn"), col("bigram"), col("cnt"))
      .orderBy(col("lang"), col("rn"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_logprob" -> (unigramLogProbQ _),
    "q_bigram_logprob"  -> (bigramLogProbQ _),
    "q_top_bigrams"     -> (topBigramsQ _),
  )

  val oracles: Map[String, String] = Map(
    // same normalized-words derivation as the decontamination shingle
    // oracle (TrainingOps.shingle8Sql), at n=2 with a per-lang rank
    "q_top_bigrams" ->
      """SELECT lang, rn, bigram, cnt FROM (
        |  SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY COUNT(*) DESC, bigram) AS BIGINT) AS rn
        |  FROM (
        |    SELECT lang, unnest(list_transform(range(1, len(ws)),
        |      i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |    FROM (SELECT lang,
        |            regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
        |          FROM documents) w) t
        |  GROUP BY lang, bigram) g
        |WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,
  )
}
