package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.plans.PolyHash64
import graft.sources.Tables

/** SURVEY.md §2.5 (continued) — corpus-curation operators for the
  * training-data pipeline: repetition-based quality filtering (the
  * Gopher/C4 rules family), per-language token-budget sampling,
  * incremental cross-corpus dedup, and per-label embedding centroids.
  *
  * Scale posture: every operator is a constant number of hash-partition
  * shuffles over per-doc or per-(group,token) keys — no per-pair state,
  * no driver materialization. The one deliberate exception is the
  * bit-exact centroid path, see [[labelCentroids]].
  */
object CorpusOps {

  // ---- Repetition / quality rules (Gopher-style) --------------------------

  /** Per-document repetition metrics over the casefolded word stream:
    * `top_frac` (share of the single most frequent word) and
    * `dup2_frac` (share of word-bigram occurrences that are repeats of
    * an earlier bigram in the same doc). High values of either mark
    * boilerplate / degenerate text — the standard "repetition" family
    * of quality rules for pre-training corpora.
    *
    * Shape: two grouped aggregations keyed by (doc, token) — map-side
    * partials do most of the work because repeated tokens collapse
    * early; nothing is ever wider than a (doc_id, token, count) row. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    repetitionStatsFromTokens(
      TextFunctions.tokenLeadRows(docs, Seq(col(idCol).as("__id")),
        col(textCol), n = 2),
      idCol)

  /** The aggregation half of [[repetitionStats]], over a pre-computed
    * token frame (__id, __w, __l1 = next word or NULL) — for callers
    * that already materialized a shared token pass (TrainingPipeline).
    * Extra columns are ignored. */
  private[operators] def repetitionStatsFromTokens(t: DataFrame, idCol: String): DataFrame = {
    val words = t
      .groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_words"), max(col("__c")).as("__top"))
      .select(col("__id"), col("n_words"),
        (col("__top").cast(DoubleType) / col("n_words").cast(DoubleType)).as("top_frac"))

    val bigrams = t.filter(col("__l1").isNotNull)
      .select(col("__id"), concat_ws(" ", col("__w"), col("__l1")).as("sh"))
      .groupBy(col("__id"), col("sh")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("__tot"), count(lit(1)).as("__dst"))
      .select(col("__id"),
        (lit(1.0) - col("__dst").cast(DoubleType) / col("__tot").cast(DoubleType))
          .as("dup2_frac"))

    words.join(bigrams, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_words"), col("top_frac"),
        coalesce(col("dup2_frac"), lit(0.0)).as("dup2_frac"))
  }

  /** §2.5 — repetition metrics + keep/drop verdict over `documents`.
    * Thresholds are the query's contract: a doc survives when no
    * single word exceeds 12% of it and under 55% of its bigrams are
    * repeats (the synthetic word-soup corpus is repetitive by
    * construction, so the cuts sit where they separate its tail). */
  def repetitionFilterQ(s: SparkSession, d: String): DataFrame =
    repetitionStats(Tables.documents(s, d), "doc_id", "text")
      .withColumn("keep", (col("top_frac") <= 0.12 && col("dup2_frac") <= 0.55))
      .orderBy(col("doc_id"))

  // ---- Token-budget sampling ----------------------------------------------

  /** The scale-safe engine behind every deterministic budget-prefix
    * draw ([[tokenBudgetSample]], [[MixtureOps.temperatureMixture]]):
    * keep each group's hash-order prefix while the exclusive running
    * token sum stays under its budget — WITHOUT sorting whole groups
    * in one task (the shape a per-group unbounded-preceding window
    * forces, and the one that dies when a single domain is terabytes).
    *
    * The hash order is cut into 2^bucketBits range buckets (arithmetic
    * `shiftright` of the signed order hash, so bucket order == draw
    * order). Per-bucket masses collapse in ONE map-side-combined
    * aggregation; the exclusive bucket-prefix mass is a window over
    * that BUCKET frame — #groups × 2^bucketBits rows, corpus-size-
    * independent. Joined back, every doc row gets a whole-bucket
    * verdict: all-in (the bucket's inclusive mass fits the budget),
    * all-out (its exclusive mass is already past it), or boundary.
    * Exactly ONE bucket per group is boundary, and only it pays an
    * exact within-bucket cumsum — partitioned by (group, bucket), so
    * the residual sort is 2^bucketBits× smaller than the per-group
    * sort it replaces and shrinks further as buckets are raised.
    *
    * Membership is bit-identical to the single-window cumsum (the
    * DuckDB oracles keep the plain-window form): a doc's exclusive
    * prefix mass is its bucket's exclusive mass plus its within-bucket
    * exclusive mass, and whole-bucket verdicts are the boundary cases
    * where that sum's comparison is decided by the bucket term alone.
    * The all-in test is STRICT (`__pre + __bs < __bud`): a bucket whose
    * inclusive mass lands exactly on the budget routes through the
    * exact within-bucket cumsum, because a zero-token doc at its tail
    * has exclusive prefix mass == budget and the plain-window `c < b`
    * semantics exclude it — an inclusive all-in would keep it.
    *
    * Contract: `tokensCol >= 0`. The bucket decomposition drops an
    * all-out bucket (`__pre >= __bud`) wholesale, which is only sound
    * when masses are non-negative (a later negative mass could bring
    * the exclusive cumsum back under budget); enforced with the same
    * up-front filter-free guard style as [[ppsSystematicSample]] — a
    * negative token count fails the run rather than silently mis-
    * sampling; a NULL token count carries zero mass (exactly what the
    * plain window's null-skipping sum did). */
  private[graft] def budgetPrefixFilter(
      docs: DataFrame, grpCol: Column, idCol: Column, hashCol: Column,
      tokensCol: Column, budgetCol: Column, bucketBits: Int = 12): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val t = tokensCol.cast(LongType)
    val aug = docs
      .withColumn("__t", when(t >= 0, t).when(t.isNull, lit(0L))
        .otherwise(raise_error(concat(
          lit("budgetPrefixFilter: negative token count — the bucket " +
            "decomposition requires non-negative masses, got "),
          t.cast(StringType)))))
      .withColumn("__bud", budgetCol.cast(LongType))
      .withColumn("__g", grpCol)
      .withColumn("__h", hashCol)
      .withColumn("__b", shiftright(col("__h"), 64 - bucketBits))
    val cuts = aug.groupBy(col("__g").as("__cg"), col("__b").as("__cb_b"))
      .agg(sum(col("__t")).as("__bs"))
    val wb = Window.partitionBy(col("__cg")).orderBy(col("__cb_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cuts.withColumn("__pre", coalesce(sum(col("__bs")).over(wb), lit(0L)))
    // the cut frame is bounded (#groups × 2^bucketBits short rows) —
    // AQE broadcasts it; the join is null-safe on the group because a
    // NULL group is a real draw group (the temperatureMixture contract)
    val joined = aug.join(cum,
      col("__g") <=> col("__cg") && col("__b") === col("__cb_b"))
    val allIn = joined.filter(col("__pre") + col("__bs") < col("__bud"))
    val wj = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__h"), idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = joined
      .filter(col("__pre") < col("__bud") && col("__pre") + col("__bs") >= col("__bud"))
      .withColumn("__cum", col("__pre") + coalesce(sum(col("__t")).over(wj), lit(0L)))
      .filter(col("__cum") < col("__bud"))
      .drop("__cum")
    allIn.unionByName(boundary)
      .drop("__t", "__bud", "__g", "__h", "__b", "__cg", "__cb_b", "__bs", "__pre")
  }

  /** Deterministic per-group corpus sample to a token budget: order
    * each group by a replayable id hash (so membership is a pure
    * function of the id set, independent of partitioning or arrival
    * order) and keep documents while the exclusive running token sum
    * is under `budget`. The standard "give me ~N tokens per language"
    * downsampling step; the draw runs on the bucketed prefix engine
    * ([[budgetPrefixFilter]]), so no group is ever sorted in one task. */
  def tokenBudgetSample(docs: DataFrame, grpCol: Column, idCol: Column,
                        tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val h = PolyHash64.poly_hash64(concat(lit("sample|"), idCol.cast(StringType)))
    budgetPrefixFilter(docs, grpCol, idCol, h, tokensCol, lit(budget))
  }

  /** §2.5 — ~5k tokens per language from `documents`. */
  def tokenBudgetSampleQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("lang"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    tokenBudgetSample(docs, col("lang"), col("doc_id"), col("n_tokens"), budget = 5000L)
      .select(col("lang"), col("doc_id"), col("n_tokens"))
      .orderBy(col("lang"), col("doc_id"))
  }

  // ---- Length-stratified budget sampling ----------------------------------

  /** Length-stratified token-budget sampling: cut the corpus into
    * `strata` equal-POPULATION strata by token count (global rank in
    * (n_tokens, id) order), then draw each stratum's deterministic
    * hash-order prefix to an equal share of the global budget — the
    * "don't let short docs drown the long tail" flattening step (the
    * length analog of [[MixtureOps.temperatureMixture]]'s domain
    * flattening).
    *
    * Scale shape: the global rank never runs as an unpartitioned — or
    * skewed — window over docs. The rank order is (n_tokens, h, id)
    * with `h` the replayable draw hash as tiebreak, so within a length
    * class the order is uniform-hash order and decomposes by hash
    * range exactly like [[budgetPrefixFilter]]: per-(length, bucket)
    * counts collapse in one map-side aggregation; the per-LENGTH
    * prefix is a window over the per-length frame (one row per
    * distinct token count — bounded-cardinality integers); the
    * per-bucket prefix within a length partitions by length over the
    * bucket frame; only the within-(length, bucket) row_number touches
    * doc rows, partitioned by BOTH keys — a single popular length
    * (half the corpus at n_tokens=512) still spreads over 2^bucketBits
    * tasks. Stratum = `(rank * strata) div n`, all-integer,
    * replayable; the draw then runs on [[budgetPrefixFilter]]. */
  def lengthStratifiedSample(docs: DataFrame, idCol: Column, tokensCol: Column,
                             strata: Int, totalBudget: Long,
                             bucketBits: Int = 12): DataFrame = {
    require(strata > 0, s"strata must be positive, got $strata")
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val h = PolyHash64.poly_hash64(concat(lit("lsamp|"), idCol.cast(StringType)))
    // NULL token counts normalize to zero mass up front — the ranked
    // equi-joins below key on n_tokens, and a NULL key would silently
    // drop the doc instead of ranking it first (0 sorts lowest)
    val aug = docs.select(idCol.as("id"),
        coalesce(tokensCol.cast(LongType), lit(0L)).as("n_tokens"),
        h.as("__h"))
      .withColumn("__b", shiftright(col("__h"), 64 - bucketBits))
    val cells = aug.groupBy(col("n_tokens").as("__ct"), col("__b").as("__cb"))
      .agg(count(lit(1)).as("__c"))
    // per-length totals → exclusive length-prefix counts (frame: one
    // row per distinct token count) + the 1-row corpus total broadcast
    val wl = Window.orderBy(col("__ct")).rowsBetween(Window.unboundedPreceding, -1)
    val lens = cells.groupBy(col("__ct")).agg(sum(col("__c")).as("__lc"))
      .withColumn("__lpre", coalesce(sum(col("__lc")).over(wl), lit(0L)))
      .crossJoin(broadcast(cells.agg(sum(col("__c")).as("__n"))))
      .select(col("__ct").as("__lt"), col("__lpre"), col("__n"))
    // exclusive bucket-prefix within each length (frame: occupied
    // (length, bucket) cells — corpus-size-independent)
    val wb = Window.partitionBy(col("__ct")).orderBy(col("__cb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cells.withColumn("__bpre", coalesce(sum(col("__c")).over(wb), lit(0L)))
      .join(lens, col("__ct") === col("__lt"))
    val wj = Window.partitionBy(col("n_tokens"), col("__b"))
      .orderBy(col("__h"), col("id"))
    val ranked = aug
      .join(cum, col("n_tokens") === col("__ct") && col("__b") === col("__cb"))
      .withColumn("__rank",
        col("__lpre") + col("__bpre") + row_number().over(wj) - lit(1L))
      .withColumn("stratum", expr(s"(__rank * $strata) div __n"))
      .select(col("id"), col("n_tokens"), col("stratum"), col("__h"))
    budgetPrefixFilter(ranked, col("stratum"), col("id"), col("__h"),
        col("n_tokens"), lit(totalBudget / strata), bucketBits)
      .drop("__h")
  }

  /** §2.5 — 4 length strata over `documents`, ~2k tokens each. */
  def lengthStratifiedQ(s: SparkSession, d: String): DataFrame =
    lengthStratifiedSample(
        Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens")),
        col("doc_id"), col("n_tokens"), strata = 4, totalBudget = 8000L)
      .select(col("stratum"), col("id").as("doc_id"), col("n_tokens"))
      .orderBy(col("stratum"), col("doc_id"))

  // ---- Weighted (PPS) systematic sampling ---------------------------------

  /** Deterministic probability-proportional-to-size sampling: ~`k` docs
    * per group, each included with probability ∝ its weight (token
    * count). Systematic PPS over a replayable hash order — lay the
    * docs out on a line of total weight W in hash order, cut it into k
    * equal strata, keep each doc that contains a stratum boundary:
    * `floor(cumBefore*k/W) < floor(cumAfter*k/W)`. All-integer math
    * (BIGINT multiply then floor-div), so the selection is exact,
    * partitioning-independent, and replayable in ANSI SQL — the
    * weighted-sampling story that `-ln(u)/w` priority sampling can't
    * deliver cross-engine. A doc heavier than W/k spans >= 1 boundary
    * and is always kept (the PPS certainty case).
    *
    * Scale shape — the same bucket decomposition as
    * [[budgetPrefixFilter]], NOT a per-group unbounded-preceding
    * window: the hash order is cut into 2^bucketBits range buckets
    * whose masses collapse in one map-side-combined aggregation; a
    * bucket spanning [pre, pre+bs) contains a stratum boundary iff
    * `(pre*k) div W < ((pre+bs)*k) div W`, so all non-crossing buckets
    * — everything except at most k per group — are dropped WHOLESALE
    * without ever sorting their docs. Only the <= k crossing buckets
    * pay an exact within-bucket cumsum (partitioned by group AND
    * bucket), each 2^bucketBits× smaller than the group sort this
    * replaces. A doc's exclusive prefix is its bucket's exclusive mass
    * plus its within-bucket exclusive mass, so membership is
    * bit-identical to the single-window form (the DuckDB oracle keeps
    * that form). */
  def ppsSystematicSample(docs: DataFrame, grpCol: Column, idCol: Column,
                          weightCol: Column, k: Int,
                          bucketBits: Int = 12): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val h = PolyHash64.poly_hash64(concat(lit("pps|"), idCol.cast(StringType)))
    val aug = docs
      .withColumn("__wt", weightCol.cast(LongType))
      // weight <= 0 carries no mass: such a doc can never contain a
      // stratum boundary, so excluding it up front is semantics-neutral
      // for zeros and the enforcement point for the non-negative-weight
      // contract (negative weights would break cumsum monotonicity AND
      // Spark `div` truncates while DuckDB `//` floors — parity only
      // holds on non-negatives)
      .filter(col("__wt") > 0)
      .withColumn("__h", h)
      .withColumn("__g", grpCol)
      .withColumn("__b", shiftright(col("__h"), 64 - bucketBits))
    // bucket masses + per-group totals: both run over the bounded cut
    // frame (#groups × 2^bucketBits short rows), never the corpus
    val cuts = aug.groupBy(col("__g").as("__cg"), col("__b").as("__cb_b"))
      .agg(sum(col("__wt")).as("__bs"))
    val wb = Window.partitionBy(col("__cg")).orderBy(col("__cb_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("__cg"))
    val cum = cuts
      .withColumn("__pre", coalesce(sum(col("__bs")).over(wb), lit(0L)))
      .withColumn("__W", sum(col("__bs")).over(wTot))
      // keep only buckets a stratum boundary lands in — at most k per
      // group survive, so the doc-side join below is highly selective.
      // __W > 0 holds because every contributing row has __wt > 0.
      .filter(expr(s"(__pre * $k) div __W < ((__pre + __bs) * $k) div __W"))
    val wj = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__h"), idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    aug
      .join(cum, col("__g") <=> col("__cg") && col("__b") === col("__cb_b"))
      .withColumn("__cb", col("__pre") + coalesce(sum(col("__wt")).over(wj), lit(0L)))
      // `div` = integer floor division on BIGINT — exact, no double
      // rounding
      .filter(expr(s"(__cb * $k) div __W < ((__cb + __wt) * $k) div __W"))
      .drop("__wt", "__h", "__g", "__b", "__cg", "__cb_b", "__bs", "__pre", "__W", "__cb")
  }

  /** §2.5 — ~8 docs per language, inclusion ∝ token count. */
  def ppsSampleQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("lang"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    ppsSystematicSample(docs, col("lang"), col("doc_id"), col("n_tokens"), k = 8)
      .select(col("lang"), col("doc_id"), col("n_tokens"))
      .orderBy(col("lang"), col("doc_id"))
  }

  // ---- Incremental cross-corpus dedup -------------------------------------

  /** Incremental-ingest dedup: flag each new-batch document whose
    * normalized text already exists in the reference corpus. The
    * corpus side is reduced to DISTINCT 128-bit content hashes before
    * the join — ids-and-hashes only through the shuffle, never text —
    * and the equi-join lets Catalyst/AQE broadcast whichever side is
    * small (a daily batch against a 100 TB corpus broadcasts the
    * batch's hash set). This is the shape that makes dedup *restart-
    * free*: the corpus is never re-paired against itself. */
  def crossDedup(corpus: DataFrame, batch: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val h = md5(TextFunctions.normalize(col(textCol)))
    val corpusH = corpus.select(h.as("__h")).distinct()
    batch.select(col(idCol), h.as("__h"))
      .join(corpusH.withColumn("__dup", lit(true)), Seq("__h"), "left")
      .select(col(idCol), coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** The corpus/batch cut shared by the incremental-ingest queries:
    * sources src15..src19 are the incoming batch, the rest the
    * standing corpus. */
  private[operators] def corpusBatchSplit(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
      .withColumn("__src_n", substring(col("source"), 4, 10).cast(IntegerType))
    (docs.filter(col("__src_n") < 15), docs.filter(col("__src_n") >= 15))
  }

  /** §2.5 — exact incremental dedup over the corpus/batch cut. */
  def crossDedupQ(s: SparkSession, d: String): DataFrame = {
    val (corpus, batch) = corpusBatchSplit(s, d)
    crossDedup(corpus, batch, "doc_id", "text").orderBy(col("doc_id"))
  }

  /** §2.5 — NEAR-dup incremental ingest over the same cut: MinHash-LSH
    * candidates restricted to batch x corpus, exact-Jaccard verified.
    * Oracle-backed probabilistically with the same 16x2 banding and
    * the same math as q_dedup_minhash (TextOps.dedupMinhashQ): the
    * cross-cut true pairs are a SUBSET of the corpus's all-pairs set
    * (every true pair ≥ 0.9 at sf0.01, ≥ 0.8 at sf0.1, nothing in
    * [0.3, 0.8)), so a pair is missed with probability ≤ 0.19^16 ≈
    * 2.9e-12 and the exact verify kills every false positive — the
    * banded batch×corpus output EQUALS the exact cross-cut Jaccard
    * join DuckDB computes. The library default (8x4) remains the
    * scale-path config; CorpusOpsSpec still cross-checks it against
    * the exact All-Pairs ground truth. */
  def crossNearDupQ(s: SparkSession, d: String): DataFrame = {
    val (corpus, batch) = corpusBatchSplit(s, d)
    Dedup.minhashCrossNearDups(corpus, batch, "doc_id", "text",
        numPerm = 32, bands = 16)
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  // ---- Label centroids -----------------------------------------------------

  /** Per-label embedding centroid in long format (label, pos, centroid,
    * n). `exact = false` (the scale default) is a plain posexplode +
    * AVG — one shuffle on (label, pos), map-side partials, linear at
    * any corpus size, but its float summation order is
    * partitioning-dependent. `exact = true` sorts each (label, pos)
    * group's values and folds them sequentially, which makes the sum a
    * pure function of the value multiset — reproducible across runs,
    * partitionings, and engines (the DuckDB oracle replays the same
    * sorted fold). The exact path holds one group's values in an array
    * (O(docs-per-label) memory), so it is the verification/small-group
    * shape, not the 100 TB default. */
  def labelCentroids(embeddings: DataFrame, labelCol: String, vecCol: String,
                     exact: Boolean = false): DataFrame = {
    val dims = embeddings.select(col(labelCol).as("label"),
      posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .select(col("label"), col("pos"), col("__v").cast(DoubleType).as("__v"))
    if (exact)
      dims.groupBy(col("label"), col("pos"))
        .agg(sort_array(collect_list(col("__v"))).as("__vs"),
          count(lit(1)).as("n"))
        .select(col("label"), col("pos"),
          (aggregate(col("__vs"), lit(0.0), (acc, x) => acc + x) /
            col("n").cast(DoubleType)).as("centroid"), col("n"))
    else
      dims.groupBy(col("label"), col("pos"))
        .agg(avg(col("__v")).as("centroid"), count(lit(1)).as("n"))
  }

  /** §2.5 — bit-exact centroids over `embeddings` (64 dims x ~10
    * labels: the sorted-fold arrays are tiny here; the `exact=false`
    * AVG plan is what a real corpus would run). */
  def labelCentroidsQ(s: SparkSession, d: String): DataFrame =
    labelCentroids(Tables.embeddings(s, d), "label", "embedding", exact = true)
      .orderBy(col("label"), col("pos"))

  /** Vocabulary growth curve (SURVEY.md §2 row 179) — exact (corpus
    * size, distinct vocabulary) checkpoints along the doc_id ingest
    * order: the empirical Heaps'-law curve (V ≈ K·nᵝ) corpus
    * diagnostics fit to answer "is the crawl still finding new
    * language, or re-crawling the same pages?" — a flattening curve
    * is saturation/duplication, a super-Heaps curve is junk influx
    * (OCR noise mints unbounded pseudo-vocabulary). The fit itself is
    * a 2-parameter display-time regression; the ENGINE's product is
    * the exact integer curve.
    *
    * Scale shape: one distinct (token, doc) pass → min(doc_id) per
    * token (map-side combined, vocabulary-bounded output) and one
    * per-doc token-count aggregation; each joins the k-row checkpoint
    * frame by BROADCAST range predicate (fan-out k, a constant), then
    * map-side-combinable sums per checkpoint. No windows, no sorting,
    * no corpus-sized shuffle beyond the two aggregations. Checkpoint
    * cutoffs are doc_id-percentile marks off a 1-row max aggregate
    * (the watermark-scalar posture) — a token is "new at checkpoint
    * p" iff its FIRST doc_id lands under the cutoff, so the curve is
    * a pure function of the data, not of partitioning. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  steps: Int = 10): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(idCol).cast(LongType).as("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("token"))
    val maxId = docs.agg(max(col(idCol).cast(LongType)).as("mx"))
    val pcts = (1 to steps).map(i => i * 100 / steps).toDF("pct")
    val cuts = pcts.crossJoin(broadcast(maxId))
      .select(col("pct").cast(LongType).as("pct"),
        GraphOps.fdiv(col("pct") * col("mx"), lit(100L)).as("cutoff"))
    val firsts = tok.groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val vocab = firsts.join(broadcast(cuts), col("first_doc") <= col("cutoff"))
      .groupBy(col("pct"), col("cutoff"))
      .agg(count(lit(1)).as("vocab"))
    val occ = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
      .join(broadcast(cuts), col("doc_id") <= col("cutoff"))
      .groupBy(col("pct")).agg(sum(col("nt")).as("n_tokens"))
    // the reassembly joins ride k-row aggregate frames — broadcast
    // them rather than let unknown stats pick a sort-merge shuffle
    cuts.join(broadcast(vocab), Seq("pct", "cutoff"), "left")
      .join(broadcast(occ), Seq("pct"), "left")
      .select(col("pct"), col("cutoff"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("vocab"), lit(0L)).as("vocab"))
  }

  /** §2 row 179 — the 10-step growth curve over documents. */
  def vocabGrowthQ(s: SparkSession, d: String): DataFrame =
    vocabGrowth(Tables.documents(s, d), "doc_id", "text", steps = 10)
      .orderBy(col("pct"))

  /** Token frequency spectrum (SURVEY.md §2 row 214) — the count-of-
    * counts table (r, n_r) = "how many distinct tokens occur exactly r
    * times": the input of Good–Turing smoothing (unseen-mass estimate
    * P₀ = n₁/N — the hapax share IS the probability the next token is
    * new), the Zipf-tail audit (is the corpus template-y? then the
    * spectrum collapses to few r values), and the companion to row
    * 179's Heaps curve (that: vocabulary vs corpus SIZE; this: the
    * shape of the frequency distribution itself). Per r: n_r and the
    * exact mass r·n_r (Σ mass = N — the conservation identity the
    * spec pins); derived ratios are display-time integer pairs already
    * on the wire.
    *
    * Scale shape: one map-side-combined token count (the row-111
    * tokenizer), one count-of-counts groupBy riding the vocabulary-
    * bounded frame, output bounded by |distinct r| ≤ √(2N). */
  def frequencySpectrum(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(regexp_extract_all(lower(textCol),
        lit("[a-z0-9]+"), lit(0))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .select(col("r"), col("n_r"), (col("r") * col("n_r")).as("mass"))

  /** Vocabulary-coverage (OOV) audit (SURVEY.md §2 row 221) — per
    * document, the fraction of token OCCURRENCES outside the corpus
    * top-k vocabulary: the gibberish/foreign-content signal word-level
    * models and fixed-vocab tokenizers feel directly (high OOV docs
    * tokenize into garbage or byte-fallback soup), and the standing
    * complement to row 42's language ID (a doc can be confidently
    * "en" and still 60% OOV — product codes, hashes, minified text).
    * Vocabulary = top `vocabSize` tokens by (count DESC, token ASC) —
    * deterministic; coverage is the exact ppm pair (n_oov·1e6 //
    * n_tokens). Token-free docs report zero counts with NULL ppm
    * (kappa posture).
    *
    * Scale shape: one map-side token count builds the vocab (bounded
    * frame + a k-row rank window on it); the per-doc pass LEFT-joins
    * exploded tokens against the BROADCAST vocab and re-aggregates by
    * doc — ids+tokens through the shuffle, text never. */
  def oovAudit(docs: DataFrame, idCol: Column, textCol: Column,
               vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(idCol.as("__id"),
      explode(regexp_extract_all(lower(textCol), lit("[a-z0-9]+"), lit(0)))
        .as("token"))
    // top-k via orderBy+limit (TakeOrderedAndProject): the vocabulary
    // frame grows with the corpus (Heaps), so a global rank window
    // over it would single-task — the joinFanout cure
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(true).as("in_vocab"))
    val perDoc = tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("in_vocab").isNull, 1L)), lit(0L)).as("n_oov"))
    docs.select(idCol.as("__id")).join(perDoc, Seq("__id"), "left")
      .select(col("__id").as("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(null))
          .otherwise(GraphOps.fdiv(coalesce(col("n_oov"), lit(0L)) * 1000000L,
            coalesce(col("n_tokens"), lit(1L)))).as("oov_ppm"))
  }

  /** §2 row 221 — OOV against the corpus top-200 vocabulary. */
  def oovQ(s: SparkSession, d: String): DataFrame =
    oovAudit(Tables.documents(s, d), col("doc_id"), col("text"),
        vocabSize = 200)
      .orderBy(col("doc_id"))

  /** §2 row 214 — the spectrum of the documents corpus. */
  def spectrumQ(s: SparkSession, d: String): DataFrame =
    frequencySpectrum(Tables.documents(s, d), col("text"))
      .orderBy(col("r"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_freq_spectrum" -> (spectrumQ _),
    "q_oov_audit"     -> (oovQ _),
    "q_vocab_growth" -> (vocabGrowthQ _),
    "q_repetition_filter"   -> (repetitionFilterQ _),
    "q_token_budget_sample" -> (tokenBudgetSampleQ _),
    "q_cross_dedup"         -> (crossDedupQ _),
    "q_cross_neardup"       -> (crossNearDupQ _),
    "q_label_centroids"     -> (labelCentroidsQ _),
    "q_pps_sample"          -> (ppsSampleQ _),
    "q_length_stratified"   -> (lengthStratifiedQ _),
  )

  // ---- Oracles -------------------------------------------------------------

  /** Casefolded word array (mirrors TextFunctions.words). */
  private val wordsSql =
    """SELECT doc_id,
      |  regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      |FROM documents""".stripMargin

  val oracles: Map[String, String] = Map(
    // the top-200 vocab by (count DESC, token ASC) ROW_NUMBER, the
    // LEFT-join OOV count per doc, nonneg floor-div ppm, and the
    // token-free NULL; docs spine keeps empty docs
    "q_oov_audit" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rn
        |    FROM tok GROUP BY token) t
        |  WHERE rn <= 200),
        |pd AS (
        |  SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(SUM(CASE WHEN vocab.token IS NULL THEN 1 END), 0) AS BIGINT) AS n_oov
        |  FROM tok LEFT JOIN vocab ON tok.token = vocab.token
        |  GROUP BY tok.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(pd.n_tokens, 0) AS n_tokens,
        |  COALESCE(pd.n_oov, 0) AS n_oov,
        |  CASE WHEN COALESCE(pd.n_tokens, 0) = 0 THEN NULL
        |       ELSE CAST(COALESCE(pd.n_oov, 0) * 1000000
        |                 // COALESCE(pd.n_tokens, 1) AS BIGINT) END AS oov_ppm
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // same tokenizer, token counts, count-of-counts, exact r·n_r mass
    "q_freq_spectrum" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
        |  FROM documents),
        |tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS r FROM tok GROUP BY token)
        |SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r,
        |  CAST(r * COUNT(*) AS BIGINT) AS mass
        |FROM tc GROUP BY r
        |ORDER BY r""".stripMargin,

    // first-doc per token + per-doc counts, each range-joined to the
    // 10 percentile cutoffs ((pct*max) floor-div 100, exact); sums in
    // HUGEINT emitted BIGINT; LEFT joins keep early empty checkpoints
    "q_vocab_growth" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
        |  FROM documents),
        |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        |cuts AS (
        |  SELECT CAST(p * 10 AS BIGINT) AS pct,
        |    CAST(((p * 10 * mx.mx) - ((((p * 10 * mx.mx) % 100) + 100) % 100)) // 100 AS BIGINT) AS cutoff
        |  FROM (SELECT unnest(range(1, 11)) AS p) _p, mx),
        |firsts AS (SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT c.pct, COUNT(*) AS vocab
        |  FROM firsts f JOIN cuts c ON f.first_doc <= c.cutoff
        |  GROUP BY c.pct),
        |occ AS (
        |  SELECT c.pct, SUM(dn.nt) AS n_tokens
        |  FROM (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY doc_id) dn
        |  JOIN cuts c ON dn.doc_id <= c.cutoff
        |  GROUP BY c.pct)
        |SELECT c.pct, c.cutoff,
        |  CAST(COALESCE(o.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(v.vocab, 0) AS BIGINT) AS vocab
        |FROM cuts c
        |LEFT JOIN vocab v ON v.pct = c.pct
        |LEFT JOIN occ o ON o.pct = c.pct
        |ORDER BY c.pct""".stripMargin,

    "q_repetition_filter" ->
      s"""WITH w AS ($wordsSql),
         |tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
         |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |wq AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         |         CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
         |       FROM tc GROUP BY 1),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |         i -> ws[i] || ' ' || ws[i+1])) AS sh
         |       FROM w WHERE len(ws) >= 2),
         |bc AS (SELECT doc_id, sh, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |bq AS (SELECT doc_id,
         |         1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup2_frac
         |       FROM bc GROUP BY 1)
         |SELECT wq.doc_id, wq.n_words, wq.top_frac,
         |  COALESCE(bq.dup2_frac, 0.0) AS dup2_frac,
         |  (wq.top_frac <= 0.12 AND COALESCE(bq.dup2_frac, 0.0) <= 0.55) AS keep
         |FROM wq LEFT JOIN bq USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_token_budget_sample" ->
      s"""WITH h AS (${TrainingOps.polyHashSql("sample|")}),
         |toks AS (
         |  SELECT lang, doc_id,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cum AS (
         |  SELECT lang, doc_id, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (
         |      PARTITION BY lang ORDER BY h.h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
         |  FROM toks JOIN h USING (doc_id))
         |SELECT lang, doc_id, n_tokens FROM cum
         |WHERE c < 5000
         |ORDER BY lang, doc_id""".stripMargin,

    // replays the SINGLE-window global rank + per-stratum prefix; the
    // engine's bucketed rank and draw must reproduce both bit-exactly
    "q_length_stratified" ->
      s"""WITH h AS (${TrainingOps.polyHashSql("lsamp|")}),
         |toks AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, n_tokens,
         |    ROW_NUMBER() OVER (ORDER BY n_tokens, h, doc_id) - 1 AS r,
         |    COUNT(*) OVER () AS n
         |  FROM toks JOIN h USING (doc_id)),
         |strat AS (
         |  SELECT doc_id, n_tokens, CAST((r * 4) // n AS BIGINT) AS stratum FROM ranked),
         |cum AS (
         |  SELECT s.stratum, s.doc_id, s.n_tokens,
         |    COALESCE(SUM(s.n_tokens) OVER (
         |      PARTITION BY s.stratum ORDER BY h.h, s.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
         |  FROM strat s JOIN h USING (doc_id))
         |SELECT stratum, doc_id, n_tokens FROM cum
         |WHERE c < 2000
         |ORDER BY stratum, doc_id""".stripMargin,

    "q_cross_dedup" ->
      """WITH n AS (
        |  SELECT doc_id, CAST(substr(source, 4) AS INTEGER) AS src_n,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
        |  FROM documents),
        |corpus AS (SELECT DISTINCT h FROM n WHERE src_n < 15)
        |SELECT b.doc_id, (corpus.h IS NOT NULL) AS is_dup
        |FROM (SELECT * FROM n WHERE src_n >= 15) b
        |LEFT JOIN corpus ON b.h = corpus.h
        |ORDER BY b.doc_id""".stripMargin,

    "q_pps_sample" ->
      s"""WITH h AS (${TrainingOps.polyHashSql("pps|")}),
         |toks AS (
         |  SELECT * FROM (
         |    SELECT lang, doc_id,
         |      CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens
         |    FROM documents) _t
         |  WHERE n_tokens > 0),
         |c AS (
         |  SELECT lang, doc_id, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (
         |      PARTITION BY lang ORDER BY h.h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
         |    SUM(n_tokens) OVER (PARTITION BY lang) AS W
         |  FROM toks JOIN h USING (doc_id))
         |SELECT lang, doc_id, n_tokens FROM c
         |WHERE (cb * 8) // W < ((cb + n_tokens) * 8) // W
         |ORDER BY lang, doc_id""".stripMargin,

    // exact cross-cut pairwise Jaccard (sparse exploded-shingle form,
    // see TextOps q_ngram_jaccard) — equals the 16x2-banded LSH output
    // by the q_dedup_minhash parity argument (see crossNearDupQ;
    // misses bounded at 2.9e-12/pair, false positives verified away)
    "q_cross_neardup" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(substr(source, 4) AS INTEGER) AS src_n,
        |    list_distinct(list_transform(range(1, len(ws)-1),
        |      i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh
        |  FROM (SELECT doc_id, source,
        |          regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
        |        FROM documents) w
        |  WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, src_n, unnest(sh) AS t FROM s),
        |sz AS (SELECT doc_id, len(sh) AS n FROM s),
        |ic AS (SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS c
        |       FROM (SELECT * FROM ex WHERE src_n >= 15) b
        |       JOIN (SELECT * FROM ex WHERE src_n < 15) c ON b.t = c.t
        |       GROUP BY 1, 2)
        |SELECT batch_id, corpus_id, jaccard FROM (
        |  SELECT ic.batch_id, ic.corpus_id,
        |    CAST(ic.c AS DOUBLE) / (sb.n + sc.n - ic.c) AS jaccard
        |  FROM ic JOIN sz sb ON sb.doc_id = ic.batch_id
        |          JOIN sz sc ON sc.doc_id = ic.corpus_id) p
        |WHERE jaccard >= 0.5
        |ORDER BY batch_id, corpus_id""".stripMargin,

    "q_label_centroids" ->
      """WITH dims AS (
        |  SELECT label, CAST(i - 1 AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(range(1, len(embedding)+1)) AS i) _i),
        |g AS (
        |  SELECT label, pos,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY v)),
        |      (a, b) -> a + b) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM dims GROUP BY 1, 2)
        |SELECT label, pos, s / CAST(n AS DOUBLE) AS centroid, n
        |FROM g
        |ORDER BY label, pos""".stripMargin,
  )
}
