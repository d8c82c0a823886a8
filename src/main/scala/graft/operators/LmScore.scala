package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_logprob" -> (unigramLogProbQ _),
  )
}
