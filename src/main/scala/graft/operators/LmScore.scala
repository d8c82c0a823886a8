package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * since round 15 the REGISTERED queries gate the integer COUNT IMAGE
  * of the score inputs ([[unigramCountImageQ]]/[[bigramCountImageQ]] —
  * oracle-exact) and only the final ln stays spec-pinned
  * (LmScoreSpec), per SURVEY §5.
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

  /** The float score emission (ln at 9 decimals, exact fold) — kept as
    * the library surface and for LmScoreSpec; the REGISTERED
    * q_unigram_logprob is [[unigramCountImageQ]] since round 15. */
  def unigramLogProbQ(s: SparkSession, d: String): DataFrame =
    unigramLogProb(Tables.documents(s, d), "doc_id", "text", exact = true)
      .select(col("doc_id"), col("n_tokens"),
        round(col("avg_logprob"), 9).as("avg_logprob"))
      .orderBy(col("doc_id"))

  /** §2.5 registered query — ORACLE-BACKED since round 15 (round-14
    * verdict item 1): the INTEGER COUNT IMAGE of the unigram score's
    * inputs, leaving only the transcendental ln outside the gate
    * (LmScoreSpec pins that). Per doc: n_tokens, n_terms (distinct
    * tokens), kc_sum = Σ k·C(w) (the score's exact count inputs), and
    * whash_sum = Σ k·bucket31(poly_hash64("lm|" + w)) — the
    * token-identity fingerprint that catches a count-permutation
    * kc_sum alone could cancel. All int64-safe: Σ k·hb ≤ n_tokens·2³¹.
    * Same two hash aggregations + one vocab join as the score path —
    * the plan shape is identical at any corpus size. */
  def unigramCountImageQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id").as("__id"),
      explode(TextFunctions.words(col("text"))).as("__w"))
    val vocab = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val hb = pmod(graft.plans.PolyHash64.poly_hash64(
      concat(lit("lm|"), col("__w"))), lit(2147483648L))
    toks.groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("__k"))
      .join(vocab, Seq("__w"))
      .select(col("__id"), col("__k"), col("__c"), hb.as("__hb"))
      .groupBy(col("__id"))
      .agg(sum(col("__k")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("__k") * col("__c")).as("kc_sum"),
        sum(col("__k") * col("__hb")).as("whash_sum"))
      .select(col("__id").as("doc_id"), col("n_tokens"), col("n_terms"),
        col("kc_sum"), col("whash_sum"))
      .orderBy(col("doc_id"))
  }

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
    * one hash agg; the bigram's next-word read by array indexing at
    * explode time — no token-stream sort at all); per-doc terms join the
    * two vocab tables on their keys (linear equi-joins, map-side
    * combinable aggs). The per-doc fold is the same sorted exact
    * reduction as the unigram path, so the score is a pure function
    * of (document, corpus) independent of partitioning. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.7): DataFrame = {
    require(lambda > 0d && lambda < 1d, s"lambda must be in (0,1), got $lambda")
    // ONE corpus tokenization feeds every consumer below (unigram
    // counts, per-doc terms, first token, token count): persisted,
    // because Spark does not dedupe common subplans — the
    // ngramJaccard/tokenPass discipline. __b is read by array indexing
    // at explode time (tokenLeadRows — no per-doc window sort). The
    // corpus bigram table derives from the PER-DOC term counts by one
    // more re-aggregation instead of a second pass over seq2.
    val seq2 = TextFunctions.tokenLeadRows(docs,
        Seq(col(idCol).as("__id")), col(textCol), n = 2)
      .withColumnRenamed("__w", "__a").withColumnRenamed("__l1", "__b")
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

  /** §2 row 115 — the float score emission (LmScoreSpec + PlanSpec
    * surface); the REGISTERED q_bigram_logprob is
    * [[bigramCountImageQ]] since round 15. */
  def bigramLogProbQ(s: SparkSession, d: String): DataFrame =
    bigramLogProb(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("avg_logprob"), 9).as("avg_logprob"))
      .orderBy(col("doc_id"))

  /** §2 row 115 registered query — ORACLE-BACKED since round 15: the
    * integer count image of the interpolated bigram score's inputs —
    * per doc n_tokens, n_terms (distinct transitions), the three
    * count-weighted sums Σ k·C(a,b) / Σ k·C(a) / Σ k·C(b) feeding the
    * λ-interpolation, and C(first token) feeding the unigram fallback
    * term. Only ln stays outside the gate (LmScoreSpec). Int64-safe to
    * ~10¹⁴ at sf1-scale corpora (k ≤ doc length, counts ≤ corpus
    * tokens). Same plan shape as [[bigramLogProb]]: zero-shuffle
    * explode, vocab-keyed equi-joins, map-side combinable. */
  def bigramCountImageQ(s: SparkSession, d: String): DataFrame = {
    val seq2 = TextFunctions.tokenLeadRows(Tables.documents(s, d),
        Seq(col("doc_id").as("__id")), col("text"), n = 2)
      .withColumnRenamed("__w", "__a").withColumnRenamed("__l1", "__b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = seq2.groupBy(col("__a")).agg(count(lit(1)).as("__ca"))
    val docTerms = seq2.filter(col("__b").isNotNull)
      .groupBy(col("__id"), col("__a"), col("__b")).agg(count(lit(1)).as("__k"))
    val big = docTerms.groupBy(col("__a"), col("__b")).agg(sum(col("__k")).as("__cab"))
    val folded = docTerms
      .join(big, Seq("__a", "__b"))
      .join(uni, Seq("__a"))
      .join(uni.select(col("__a").as("__b"), col("__ca").as("__cb")), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__k") * col("__cab")).as("kcab_sum"),
        sum(col("__k") * col("__ca")).as("kca_sum"),
        sum(col("__k") * col("__cb")).as("kcb_sum"))
    val firstTok = seq2.filter(col("__pos") === 0)
      .join(uni, Seq("__a"))
      .select(col("__id"), col("__ca").as("c_first"))
    val nTok = seq2.groupBy(col("__id")).agg(count(lit(1)).as("n_tokens"))
    nTok.join(firstTok, Seq("__id"))
      .join(folded, Seq("__id"), "left") // one-word docs have no bigrams
      .select(col("__id").as("doc_id"), col("n_tokens"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("kcab_sum"), lit(0L)).as("kcab_sum"),
        coalesce(col("kca_sum"), lit(0L)).as("kca_sum"),
        coalesce(col("kcb_sum"), lit(0L)).as("kcb_sum"),
        col("c_first"))
      .orderBy(col("doc_id"))
  }

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

  /** §2.11 row 129 — PMI collocations, exactly. PMI(x,y) =
    * ln(p(x,y)/(p(x)p(y))) ranks identically to the LIFT
    * c_xy·N1/(c_x·c_y): ln is monotone and the remaining N1/N2 factor
    * is a per-corpus constant — so the transcendental drops out of the
    * ORDER entirely (the DSIR lesson applied to collocation mining).
    * The reported score is the fixed-point lift image,
    * (SCALE·c_xy·N1) div (c_x·c_y): decimal(38,0) products,
    * IntegralDivide, engine-independent. Bounds: numerator ≤
    * SCALE·n_xy·N1 ≤ 1e32 < 1e38; lift ≤ SCALE·N1/minCount < 2^63
    * for corpora to ~10^13 tokens at the defaults.
    *
    * Scale shape: unigram and bigram count tables are VOCAB-bounded —
    * both broadcast; the min-count gate prunes the bigram tail before
    * the joins; selection is TakeOrderedAndProject. The corpus is
    * scanned twice (unigram explode + bigram shingle pass), each a
    * single aggregation. */
  def collocations(docs: DataFrame, idCol: Column, textCol: Column,
                   minCount: Long = 10, topK: Int = 20,
                   scale: Long = 1000000L): DataFrame = {
    require(minCount >= 1 && topK > 0 && scale > 0, "bad collocation params")
    val D = DecimalType(20, 0)
    val uni = docs.select(idCol.as("__id"), explode(TextFunctions.words(textCol)).as("w"))
    val cu = uni.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val n1 = uni.agg(count(lit(1)).as("n1"))
    val cb = TextFunctions.shingleRows(
        docs.select(idCol.as("__id"), textCol.as("__t")),
        Seq(col("__id")), col("__t"), n = 2, out = "bigram")
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    cb.withColumn("__x", split(col("bigram"), " ").getItem(0))
      .withColumn("__y", split(col("bigram"), " ").getItem(1))
      .join(broadcast(cu.select(col("w").as("__x"), col("c1").as("__cx"))), "__x")
      .join(broadcast(cu.select(col("w").as("__y"), col("c1").as("__cy"))), "__y")
      .crossJoin(broadcast(n1))
      .withColumn("lift", call_function("div",
        lit(scale).cast(D) * col("n_xy").cast(D) * col("n1").cast(D),
        col("__cx").cast(D) * col("__cy").cast(D)))
      .select(col("bigram"), col("n_xy"), col("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(topK)
  }

  /** §2.11 — top-20 collocations by exact PMI rank. */
  def collocationsQ(s: SparkSession, d: String): DataFrame =
    collocations(Tables.documents(s, d), col("doc_id"), col("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_logprob" -> (unigramCountImageQ _),
    "q_bigram_logprob"  -> (bigramCountImageQ _),
    "q_top_bigrams"     -> (topBigramsQ _),
    "q_collocations"    -> (collocationsQ _),
  )

  /** The shared normalized-words SQL twin of TextFunctions.words. */
  private val WordsSql =
    """regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')"""

  val oracles: Map[String, String] = Map(
    // the unigram count image: per-doc term counts × vocab counts ×
    // the poly-hash token fingerprint — only ln stays outside
    "q_unigram_logprob" ->
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |tk AS (SELECT doc_id, unnest(ws) AS wd FROM w),
         |vocab AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY wd),
         |terms AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS k
         |          FROM tk GROUP BY 1, 2),
         |vd AS (SELECT DISTINCT wd FROM vocab),
         |hs AS (${TrainingOps.polyHashSql("lm|", "vd", "wd")}),
         |hb AS (SELECT wd, ((h % 2147483648) + 2147483648) % 2147483648 AS hb FROM hs)
         |SELECT t.doc_id,
         |  CAST(SUM(t.k) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  CAST(SUM(t.k * v.c) AS BIGINT) AS kc_sum,
         |  CAST(SUM(t.k * hb.hb) AS BIGINT) AS whash_sum
         |FROM terms t JOIN vocab v USING (wd) JOIN hb USING (wd)
         |GROUP BY t.doc_id
         |ORDER BY doc_id""".stripMargin,

    // the bigram count image: doc transition counts × corpus bigram /
    // unigram counts + the first-token unigram count
    "q_bigram_logprob" ->
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |s2 AS (
         |  SELECT doc_id, i.i AS pos, ws[CAST(i.i AS INTEGER)] AS a,
         |    CASE WHEN i.i < len(ws) THEN ws[CAST(i.i AS INTEGER) + 1] END AS b
         |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) i),
         |uni AS (SELECT a AS wd, CAST(count(*) AS BIGINT) AS ca FROM s2 GROUP BY 1),
         |dt AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS k
         |       FROM s2 WHERE b IS NOT NULL GROUP BY 1, 2, 3),
         |big AS (SELECT a, b, CAST(SUM(k) AS BIGINT) AS cab FROM dt GROUP BY 1, 2),
         |f AS (
         |  SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM(dt.k * big.cab) AS BIGINT) AS kcab_sum,
         |    CAST(SUM(dt.k * ua.ca) AS BIGINT) AS kca_sum,
         |    CAST(SUM(dt.k * ub.ca) AS BIGINT) AS kcb_sum
         |  FROM dt JOIN big USING (a, b)
         |  JOIN uni ua ON ua.wd = dt.a
         |  JOIN uni ub ON ub.wd = dt.b
         |  GROUP BY dt.doc_id),
         |ft AS (SELECT s2.doc_id, uni.ca AS c_first
         |       FROM s2 JOIN uni ON uni.wd = s2.a WHERE s2.pos = 1),
         |nt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
         |       FROM s2 GROUP BY 1)
         |SELECT nt.doc_id, nt.n_tokens,
         |  COALESCE(f.n_terms, 0) AS n_terms,
         |  COALESCE(f.kcab_sum, 0) AS kcab_sum,
         |  COALESCE(f.kca_sum, 0) AS kca_sum,
         |  COALESCE(f.kcb_sum, 0) AS kcb_sum,
         |  ft.c_first
         |FROM nt JOIN ft USING (doc_id) LEFT JOIN f USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

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

    // lift = (SCALE·c_xy·N1) // (c_x·c_y) in HUGEINT — the integer
    // image whose ORDER equals PMI's for a fixed corpus
    "q_collocations" ->
      """WITH w AS (SELECT doc_id,
        |        regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
        |      FROM documents),
        |uni AS (SELECT unnest(ws) AS wd FROM w),
        |cu AS (SELECT wd, count(*) AS c1 FROM uni GROUP BY wd),
        |n1 AS (SELECT count(*) AS n FROM uni),
        |cb AS (
        |  SELECT bigram, count(*) AS n_xy FROM (
        |    SELECT unnest(list_transform(range(1, len(ws)),
        |      i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM w) b
        |  GROUP BY bigram HAVING count(*) >= 10),
        |parts AS (
        |  SELECT bigram, n_xy,
        |    string_split(bigram, ' ')[1] AS x, string_split(bigram, ' ')[2] AS y
        |  FROM cb)
        |SELECT p.bigram, CAST(p.n_xy AS BIGINT) AS n_xy,
        |  CAST((1000000 * CAST(p.n_xy AS HUGEINT) * (SELECT n FROM n1))
        |    // (CAST(cx.c1 AS HUGEINT) * cy.c1) AS BIGINT) AS lift
        |FROM parts p
        |JOIN cu cx ON p.x = cx.wd
        |JOIN cu cy ON p.y = cy.wd
        |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin,
  )
}
