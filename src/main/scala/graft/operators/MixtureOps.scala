package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.plans.PolyHash64
import graft.sources.Tables

/** Domain-mixture resampling under a global token budget (SURVEY.md
  * §2.7) — the "data mixing" step of a pre-training pipeline: given
  * per-domain token masses t_d, allocate a global budget B across
  * domains by temperature-flattened weights and then draw each
  * domain's share deterministically.
  *
  * Temperature: sampling weight w_d = t_d^(1/T). T=1 is natural
  * proportions; T→∞ is uniform; T=2 (the registered config) is the
  * common "flatten moderately so small domains are not drowned" choice
  * (cf. multilingual sampling in XLM-R / mT5). t_d^(1/2) = isqrt is
  * IEEE-exact (sqrt is a correctly-rounded operation, and floor of it
  * on BIGINT-ranged inputs is engine-independent), which makes the
  * whole allocation replayable — the T knob accepts any value, but
  * only T ∈ {1, 2} keeps the oracle-parity guarantee; other T run the
  * same plan with a double pow().
  *
  * Allocation: B_d = B * w_d // Σw (integer floor — the ALLOCATION
  * never exceeds B). Within a domain the draw is the deterministic
  * hash-order token-budget prefix of [[CorpusOps.tokenBudgetSample]]:
  * prefix semantics admit the document that crosses the boundary, so
  * the DRAWN tokens may overshoot B_d (and the global total B) by at
  * most one document per domain — membership is a pure function of
  * the id set, independent of partitioning.
  *
  * Scale shape: one grouped aggregation for the domain masses (tiny
  * result, broadcast back); the prefix draw runs on the bucketed
  * engine ([[CorpusOps.budgetPrefixFilter]]), so only each domain's
  * single boundary bucket — 2^bucketBits× smaller than the domain —
  * pays an exact sort. No driver state; domains (and their hash
  * buckets) are the natural partition key.
  */
object MixtureOps {

  /** Per-domain budget allocation: (domain, t_tokens, weight, budget).
    * `temperature` must be 1 or 2 for cross-engine exactness (see
    * class doc); the general-T path is the same two-line plan with
    * pow(). */
  def domainBudgets(docs: DataFrame, domainCol: Column, tokensCol: Column,
                    totalBudget: Long, temperature: Int = 2): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    require(temperature == 1 || temperature == 2,
      s"oracle-exact temperatures are 1 and 2, got $temperature")
    val mass = docs.groupBy(domainCol.as("domain"))
      .agg(sum(tokensCol.cast(LongType)).as("t_tokens"))
      .filter(col("t_tokens") > 0)
    val weight =
      if (temperature == 1) col("t_tokens")
      else floor(sqrt(col("t_tokens").cast(DoubleType))).cast(LongType)
    // The allocation product runs in DECIMAL(38,0): at T=1 the weight
    // IS the domain token mass (~1e13 at 100 TB), and weight × a
    // ~1e12-token budget (~1e25) silently wraps a Long under non-ANSI
    // mode — dropping exactly the LARGEST domains. 38 digits hold any
    // realistic mass × budget; `div` floors back to BIGINT. The weight
    // total rides a broadcast 1-row aggregate, not a global window (an
    // unpartitioned window funnels the frame to one task).
    val w = mass.withColumn("weight", weight)
    w.crossJoin(broadcast(w.agg(sum(col("weight")).as("__wtot"))))
      .withColumn("budget",
        expr(s"CAST((CAST(weight AS DECIMAL(38,0)) * ${totalBudget}L) div __wtot AS BIGINT)"))
      .drop("__wtot")
  }

  /** Largest-remainder (Hamilton) apportionment (SURVEY.md §2 row 165)
    * — integer quotas proportional to `wCol` that sum to EXACTLY
    * `budget`. [[domainBudgets]]' floor allocation undershoots by up
    * to (#domains − 1) tokens; when the budget is a contract (exact
    * per-domain shard counts, sampling quotas that must tile a fixed
    * token budget), the remainder must be distributed, and naive
    * per-row rounding breaks the sum. Hamilton's method: base_d =
    * ⌊B·w_d/W⌋, then the D = B − Σbase largest fractional parts get
    * +1. Fractions are compared WITHOUT division: rem_d = (B·w_d)
    * mod W is the fraction's numerator over the common denominator W
    * — pure integers, so DuckDB replays the allocation verbatim
    * (products ride DECIMAL(38,0)/HUGEINT; the domainBudgets overflow
    * posture).
    *
    * D < |{d : rem_d > 0}| always (Σrem = D·W, each rem < W), so
    * zero-remainder domains — in particular zero-weight ones — never
    * receive a bonus unit; the `rem > 0` guard documents that
    * invariant rather than creating it. Ties in rem break by key ASC
    * — total order, deterministic under any partitioning.
    *
    * Scale shape: the corpus-sized work is the caller's weight
    * aggregation; this operator runs on the DOMAIN-bounded frame —
    * total weight and deficit are broadcast 1-row aggregates and the
    * single unpartitioned rank window rides the domain frame (the
    * skyline posture: bounded by the domain count, never the corpus). */
  def apportion(weights: DataFrame, keyCols: Seq[String], wCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(keyCols.nonEmpty, "at least one key column required")
    val w = weights.select(
      keyCols.map(col) :+ col(wCol).cast(LongType).as("__w"): _*)
    val base = w
      .crossJoin(broadcast(w.agg(sum(col("__w")).as("__wtot"))))
      .withColumn("__base",
        expr(s"CAST((CAST(__w AS DECIMAL(38,0)) * ${budget}L) div __wtot AS BIGINT)"))
      .withColumn("__rem",
        expr(s"CAST((CAST(__w AS DECIMAL(38,0)) * ${budget}L) % __wtot AS BIGINT)"))
    val ranked = base
      .crossJoin(broadcast(base.agg((lit(budget) - sum(col("__base"))).as("__def"))))
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("__rem").desc +: keyCols.map(col(_).asc): _*)))
    ranked
      .select(keyCols.map(col) ++ Seq(
        col("__w").as("weight"),
        (col("__base") + when(col("__rn") <= col("__def") && col("__rem") > 0, 1L)
          .otherwise(0L)).as("quota")): _*)
  }

  /** §2 row 165 — a prime budget (forces remainders) over the
    * (lang, source) char-mass domains of `documents`. */
  def apportionQ(s: SparkSession, d: String): DataFrame =
    apportion(
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_chars")).as("mass")),
      Seq("lang", "source"), "mass", budget = 999983L)
      .orderBy(col("lang"), col("source"))

  /** The resampled corpus: every doc kept by the temperature mixture,
    * with its domain's allocation alongside. */
  def temperatureMixture(docs: DataFrame, domainCol: Column, idCol: Column,
                         tokensCol: Column, totalBudget: Long,
                         temperature: Int = 2): DataFrame = {
    // the budget side's key is renamed so a caller whose domain column
    // is itself named "domain" cannot collide with it
    val budgets = domainBudgets(docs, domainCol, tokensCol, totalBudget, temperature)
      .select(col("domain").as("__mix_dom"), col("budget"))
    val h = PolyHash64.poly_hash64(concat(lit("mix|"), idCol.cast(StringType)))
    // null-safe join: a NULL domain is a real group (domainBudgets
    // allocates it a share), and a plain equi-join would silently drop
    // its docs while still letting its weight shrink every other
    // domain's allocation.
    // The draw itself runs on the bucketed prefix engine
    // ([[CorpusOps.budgetPrefixFilter]]) — membership is provably
    // identical to the per-domain unbounded-preceding window (the
    // DuckDB oracle keeps that form), but no domain is ever sorted in
    // one task, so a terabyte-scale domain cannot funnel the draw.
    CorpusOps.budgetPrefixFilter(
        docs.join(broadcast(budgets), domainCol <=> col("__mix_dom")),
        domainCol, idCol, h, tokensCol, col("budget"))
      .drop("__mix_dom")
  }

  /** Domain-characteristic tokens by chi-square (SURVEY.md §2.10) —
    * the mixture DIAGNOSTIC next to the mixture itself: which tokens
    * are statistically over-represented in each domain vs the rest of
    * the corpus (the standard 2×2 contingency test over occurrence
    * counts; the signature-term / corpus-drift report every mixing
    * decision starts from).
    *
    * Cross-engine exactness without ln(): chi² = N·(ad−bc)² /
    * ((a+b)(c+d)(a+c)(b+d)) is RATIONAL in the four counts, and the
    * double-precision evaluation is pinned to one explicit association
    * (mirrored token-for-token in the oracle), so both engines round
    * identically — the row-111 BM25 posture: compare on the floored
    * 1e-6 LONG image of a bit-deterministic double. The over-
    * representation gate (ad > bc) stays EXACT — the products are
    * taken in decimal(38,0), which holds any long×long without
    * overflow (d ≈ N, so a 64-bit product would wrap for common
    * tokens at corpus scale; the image never decides membership,
    * only rank).
    *
    * Scale shape: ONE corpus-scale aggregation — groupBy(domain, token)
    * after the explode; every later frame (token totals, domain totals,
    * the 1-row N) re-aggregates that vocab×domains result, and the
    * identical exchange is planned once (reused-exchange), so corpus
    * text is scanned and shuffled a single time. Domain totals and N
    * ride broadcasts; the top-k rank window partitions by domain over a
    * VOCAB-bounded frame, never a corpus-bounded one. */
  def characteristicTokens(docs: DataFrame, domainCol: Column, textCol: Column,
                           topK: Int = 10): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val D = DoubleType
    val toks = docs.select(domainCol.as("source"),
      explode(TextFunctions.tokens(textCol)).as("token"))
    val st = toks.groupBy(col("source"), col("token")).agg(count(lit(1)).as("a"))
    val tt = st.groupBy(col("token")).agg(sum(col("a")).as("rt"))
    val stot = st.groupBy(col("source")).agg(sum(col("a")).as("ts"))
    val ntot = st.agg(sum(col("a")).as("n"))
    val j = st.join(tt, "token").join(broadcast(stot), "source")
      .crossJoin(broadcast(ntot))
      .withColumn("b", col("rt") - col("a"))
      .withColumn("c", col("ts") - col("a"))
      .withColumn("d", col("n") - col("rt") - col("ts") + col("a"))
      // widen to decimal before the cross-products: d ≈ n (total corpus
      // occurrences), so a*d exceeds Long for any token with more than
      // ~2^63/n in-domain hits — decimal(20,0)×decimal(20,0) plans a
      // decimal(38,0) product, which holds any long×long exactly
      .filter(col("a").cast(DecimalType(20, 0)) * col("d").cast(DecimalType(20, 0)) >
              col("b").cast(DecimalType(20, 0)) * col("c").cast(DecimalType(20, 0)))
    val diff = col("a").cast(D) * col("d").cast(D) -
      col("b").cast(D) * col("c").cast(D)
    val chi = col("n").cast(D) * diff * diff /
      (col("rt").cast(D) * (col("n") - col("rt")).cast(D)) /
      (col("ts").cast(D) * (col("n") - col("ts")).cast(D))
    val ranked = j
      .withColumn("chi2_img", floor(chi * lit(1000000.0)).cast(LongType))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("chi2_img").desc, col("token"))).cast(LongType))
      .filter(col("rn") <= topK)
    ranked.select(col("source"), col("token"), col("a").as("n_in"),
      col("b").as("n_out"), col("chi2_img"), col("rn"))
  }

  /** §2.10 — top-10 signature tokens per `source`. */
  def chi2TokensQ(s: SparkSession, d: String): DataFrame =
    characteristicTokens(Tables.documents(s, d), col("source"), col("text"))
      .orderBy(col("source"), col("rn"))

  /** §2.7 — ~8k tokens re-mixed across `source` domains at T=2. */
  def domainMixtureQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    temperatureMixture(docs, col("source"), col("doc_id"), col("n_tokens"),
        totalBudget = 8000L)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("budget"))
      .orderBy(col("source"), col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_domain_mixture" -> (domainMixtureQ _),
    "q_chi2_tokens"    -> (chi2TokensQ _),
    "q_apportion"      -> (apportionQ _),
  )

  val oracles: Map[String, String] = Map(
    // pure integer replay: products in HUGEINT, floor-div base,
    // mod-W remainder numerators, deficit = B - sum(base), rank by
    // (rem DESC, keys ASC) over the domain-bounded frame
    "q_apportion" ->
      """WITH mass AS (
        |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS weight
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT SUM(weight) AS wt FROM mass),
        |b AS (
        |  SELECT lang, source, weight,
        |    (weight * 999983) // wt AS base,
        |    (weight * 999983) % wt AS rem
        |  FROM mass CROSS JOIN tot),
        |d AS (SELECT 999983 - SUM(base) AS def FROM b),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rn
        |  FROM b)
        |SELECT lang, source, weight,
        |  CAST(base + CASE WHEN rn <= (SELECT def FROM d) AND rem > 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM r ORDER BY lang, source""".stripMargin,

    // the double-precision chi² evaluation mirrors the Scala column
    // expression ASSOCIATION-FOR-ASSOCIATION (left-assoc * and /), so
    // both engines produce the same IEEE bits and the floored 1e-6
    // image compares exactly; membership (ad > bc) is exact integer
    "q_chi2_tokens" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS token
        |  FROM documents),
        |st AS (SELECT source, token, COUNT(*) AS a FROM toks GROUP BY 1, 2),
        |tt AS (SELECT token, CAST(SUM(a) AS BIGINT) AS rt FROM st GROUP BY 1),
        |stot AS (SELECT source, CAST(SUM(a) AS BIGINT) AS ts FROM st GROUP BY 1),
        |ntot AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM st),
        |j AS (
        |  SELECT st.source, st.token, a, rt, ts, n,
        |    rt - a AS b, ts - a AS c, n - rt - ts + a AS d
        |  FROM st JOIN tt USING (token) JOIN stot USING (source) CROSS JOIN ntot),
        |chi AS (
        |  SELECT source, token, a, b,
        |    CAST(floor(
        |      CAST(n AS DOUBLE)
        |        * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |        * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |        / (CAST(rt AS DOUBLE) * CAST(n - rt AS DOUBLE))
        |        / (CAST(ts AS DOUBLE) * CAST(n - ts AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS chi2_img
        |  FROM j WHERE a * d > b * c),
        |r AS (
        |  SELECT source, token, CAST(a AS BIGINT) AS n_in, CAST(b AS BIGINT) AS n_out,
        |    chi2_img,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY chi2_img DESC, token)
        |      AS BIGINT) AS rn
        |  FROM chi)
        |SELECT source, token, n_in, n_out, chi2_img, rn
        |FROM r WHERE rn <= 10
        |ORDER BY source, rn""".stripMargin,

    "q_domain_mixture" ->
      s"""WITH h AS (${TrainingOps.polyHashSql("mix|")}),
         |toks AS (
         |  SELECT source, doc_id,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens
         |  FROM documents),
         |mass AS (
         |  SELECT source, SUM(n_tokens) AS t_tokens FROM toks
         |  GROUP BY source HAVING SUM(n_tokens) > 0),
         |wt AS (
         |  SELECT source, CAST(floor(sqrt(CAST(t_tokens AS DOUBLE))) AS BIGINT) AS weight
         |  FROM mass),
         |bud AS (
         |  SELECT source, (weight * 8000) // (SELECT SUM(weight) FROM wt) AS budget
         |  FROM wt),
         |cum AS (
         |  SELECT t.source, t.doc_id, t.n_tokens, b.budget,
         |    COALESCE(SUM(t.n_tokens) OVER (
         |      PARTITION BY t.source ORDER BY h.h, t.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
         |  FROM toks t JOIN h USING (doc_id) JOIN bud b ON t.source = b.source)
         |SELECT source, doc_id, n_tokens, CAST(budget AS BIGINT) AS budget
         |FROM cum
         |WHERE c < budget
         |ORDER BY source, doc_id""".stripMargin,
  )
}
