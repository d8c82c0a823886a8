package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Cohen's kappa — chance-corrected agreement between two categorical
  * labelers (SURVEY.md §2 row 172). The labeler-QA primitive every
  * labeled-data pipeline runs: raw accuracy flatters any pair of
  * raters on a skewed label distribution (two raters that both say
  * "en" 95% of the time agree 90%+ by luck alone); kappa subtracts
  * the agreement their marginals would produce by chance,
  *   kappa = (po − pe) / (1 − pe),
  * the standard statistic for inter-annotator agreement and for
  * classifier-vs-truth eval beyond accuracy (Cohen 1960).
  *
  * Integer exactness: with N = Σ counts, A = Σ diagonal counts and
  * E = Σ_L row_L·col_L (marginal products over the UNION of both
  * raters' label domains), kappa = (N·A − E) / (N² − E) — numerator
  * and denominator are pure BIGINT, so DuckDB replays them hash-exact
  * and the caller divides at display time. OVERFLOW CONTRACT: N² must
  * stay under 2^63 → N < 3.03e9 rated rows; beyond that, kappa over a
  * uniform row sample is statistically indistinguishable (it is a
  * ratio of proportions) — the documented escape hatch.
  *
  * Scale shape: ONE map-side-combined groupBy over the corpus builds
  * the contingency table (label-domain² rows, i.e. tiny); every
  * derived frame — marginals, the full-outer marginal join, the three
  * 1-row aggregates — is label-domain-bounded, then crossJoined as
  * 1-row broadcasts (the watermark-scalar posture). Rows where either
  * rater is NULL are excluded up front (an abstaining rater is not a
  * category; the contract is rated-by-both).
  */
object Agreement {

  /** One row: n, agree, chance_num = Σ r_i·c_i, kappa_num = n·agree −
    * chance_num, kappa_den = n² − chance_num (all BIGINT). kappa_den =
    * 0 (empty input, or both raters constant with identical marginals)
    * means kappa is undefined — the caller's guard, kept explicit
    * rather than masked with a sentinel. */
  def cohenKappa(labeled: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = labeled
      .select(col(aCol).as("ra"), col(bCol).as("rb"))
      .filter(col("ra").isNotNull && col("rb").isNotNull)
      .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("c"))
    val tot = ct.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(when(col("ra") === col("rb"), col("c"))), lit(0L)).as("agree"))
    val rm = ct.groupBy(col("ra")).agg(sum(col("c")).as("r"))
    val cm = ct.groupBy(col("rb")).agg(sum(col("c")).as("cl"))
    // full outer over the label-domain union: a label one rater never
    // uses has marginal 0 on that side and contributes 0 to E
    val chance = rm.join(cm, rm("ra") === cm("rb"), "full")
      .select((coalesce(col("r"), lit(0L)) * coalesce(col("cl"), lit(0L))).as("rc"))
      .agg(coalesce(sum(col("rc")), lit(0L)).as("chance_num"))
    tot.crossJoin(chance).select(
      col("n"), col("agree"), col("chance_num"),
      (col("n") * col("agree") - col("chance_num")).as("kappa_num"),
      (col("n") * col("n") - col("chance_num")).as("kappa_den"))
  }

  /** §2 row 172 — kappa of the row-42 language-ID heuristic against
    * the labeled `lang` column: chance-corrected langid quality (the
    * documents corpus is label-skewed, so accuracy alone overstates
    * the classifier — exactly kappa's point). */
  def kappaQ(s: SparkSession, d: String): DataFrame =
    cohenKappa(
      Tables.documents(s, d)
        .select(TextFunctions.langId(col("text")).as("pred"), col("lang")),
      "pred", "lang")

  /** Krippendorff's alpha, nominal (SURVEY.md §2 row 244) — kappa's
    * MULTI-RATER, missing-tolerant generalization: any number of
    * raters, any unit rated by any subset (kappa needs exactly two
    * complete raters). The coincidence formulation (Krippendorff
    * 2004): per unit u with m_u ≥ 2 ratings, ordered pairs contribute
    * 1/(m_u−1); observed disagreement Do = Σ_u (m_u² − Σ_c cnt_c(u)²)
    * /(m_u−1); expected De = (n² − Σ_c n_c²)/(n−1) over the INTEGER
    * marginals n_c; alpha = 1 − Do/De.
    *
    * Integer exactness: only Do is fractional, with per-unit
    * denominators m_u−1 ∈ {1..maxRaters−1} — multiplying by L =
    * lcm(1..maxRaters−1) makes Do·L integer, so
    *   alpha = (L·De' − (n−1)·DoL) / (L·De'),  De' = n² − Σ n_c²
    * ships as a BIGINT (num, den) pair + one pinned display division
    * (NULL when De' = 0 — a single label value has no chance
    * disagreement to correct). OVERFLOW CONTRACT: L·n² < 2^63.
    *
    * Scale shape: one map-side (unit, value) count, one unit-level
    * aggregate (m², Σcnt² via sum over the tiny per-unit value frame),
    * value-domain-bounded marginals, three 1-row scalars. No window,
    * no join wider than the label domain. */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String, valueCol: String,
                        maxRaters: Int = 8): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 12,
      s"maxRaters must be in [2, 12], got $maxRaters")
    val L: Long = (1 until maxRaters).foldLeft(1L) { (acc, k) =>
      acc / gcd(acc, k.toLong) * k
    }
    val uv = ratings
      .select(col(unitCol).as("u"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
    val perUnit = uv.groupBy(col("u"))
      .agg(sum(col("c")).as("m"), sum(col("c") * col("c")).as("s2"))
      .filter(col("m") >= 2L)
    // the maxRaters contract is ENFORCED, not assumed: L = lcm(1..
    // maxRaters-1) makes L/(m-1) exact only while m <= maxRaters —
    // beyond that the division truncates silently and alpha is wrong
    // with no error, so a violating unit raises instead
    val doL = perUnit
      .select((when(col("m") <= lit(maxRaters.toLong),
          (col("m") * col("m") - col("s2")) *
            (lit(L) / (col("m") - 1L)).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"krippendorffAlpha: unit "), col("u").cast("string"),
          lit(s" has m > maxRaters=$maxRaters ratings (m="),
          col("m").cast("string"),
          lit(") - raise maxRaters to cover the data"))))).as("d"))
      .agg(coalesce(sum(col("d")), lit(0L)).as("do_l"),
        count(lit(1)).as("n_units"))
    val marg = uv.join(perUnit.select(col("u")), Seq("u"))
      .groupBy(col("v")).agg(sum(col("c")).as("nc"))
      .agg(coalesce(sum(col("nc")), lit(0L)).as("n"),
        coalesce(sum(col("nc") * col("nc")), lit(0L)).as("snc2"))
    doL.crossJoin(marg).select(
      col("n_units"), col("n"), col("do_l"), lit(L).as("l"),
      (col("n") * col("n") - col("snc2")).as("de_p"))
      .select(col("n_units"), col("n"), col("do_l"), col("l"), col("de_p"),
        (col("l") * col("de_p") - (col("n") - 1L) * col("do_l")).as("alpha_num"),
        (col("l") * col("de_p")).as("alpha_den"))
      .withColumn("alpha",
        when(col("de_p") === 0L, lit(null))
          .otherwise(col("alpha_num").cast("double") / col("alpha_den").cast("double")))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** §2 row 244 — alpha over four seeded raters of the `lang` label:
    * rater 1 = truth, rater 2 disagrees every 5th doc, rater 3
    * abstains every 7th (the missing-data case kappa cannot take),
    * rater 4 disagrees every 11th. */
  def alphaQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val r = Seq(
      col("lang").as("v1"),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("xx")).otherwise(col("lang")).as("v2"),
      when(pmod(col("doc_id"), lit(7)) === 0, lit(null)).otherwise(col("lang")).as("v3"),
      when(pmod(col("doc_id"), lit(11)) === 0, lit("xx")).otherwise(col("lang")).as("v4"))
    val ratings = docs.select(Seq(col("doc_id")) ++ r: _*)
      .select(col("doc_id"), explode(array(col("v1"), col("v2"), col("v3"), col("v4"))).as("v"))
    krippendorffAlpha(ratings, "doc_id", "v", maxRaters = 4)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cohen_kappa" -> (kappaQ _),
    "q_kripp_alpha" -> (alphaQ _))

  val oracles: Map[String, String] = Map(
    // same four-rater seeding; coincidence DoL with the L=lcm(1..3)=6
    // common denominator, integer marginals over m>=2 units, the
    // rational (num, den) pair and ONE pinned display division
    "q_kripp_alpha" ->
      """WITH r AS (
        |  SELECT doc_id, unnest([
        |    lang,
        |    CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END,
        |    CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END]) AS v
        |  FROM documents),
        |uv AS (SELECT doc_id AS u, v, COUNT(*) AS c
        |       FROM r WHERE v IS NOT NULL GROUP BY 1, 2),
        |pu AS (SELECT u, SUM(c) AS m, SUM(c * c) AS s2
        |       FROM uv GROUP BY u HAVING SUM(c) >= 2),
        |dl AS (SELECT
        |    CAST(COALESCE(SUM((m * m - s2) * (6 // (m - 1))), 0) AS BIGINT) AS do_l,
        |    CAST(COUNT(*) AS BIGINT) AS n_units
        |  FROM pu),
        |mg AS (SELECT
        |    CAST(COALESCE(SUM(nc), 0) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(nc * nc), 0) AS BIGINT) AS snc2
        |  FROM (SELECT uv.v, SUM(uv.c) AS nc
        |        FROM uv JOIN pu ON uv.u = pu.u GROUP BY uv.v) _m)
        |SELECT n_units, n, do_l, CAST(6 AS BIGINT) AS l,
        |  n * n - snc2 AS de_p,
        |  6 * (n * n - snc2) - (n - 1) * do_l AS alpha_num,
        |  6 * (n * n - snc2) AS alpha_den,
        |  CASE WHEN n * n - snc2 = 0 THEN NULL
        |       ELSE CAST(6 * (n * n - snc2) - (n - 1) * do_l AS DOUBLE)
        |            / CAST(6 * (n * n - snc2) AS DOUBLE) END AS alpha
        |FROM dl CROSS JOIN mg""".stripMargin,
    // langid CTE shared verbatim with q_lang_id; contingency,
    // marginals and the three scalars replayed in HUGEINT, emitted
    // BIGINT (the documented N < 3.03e9 contract)
    "q_cohen_kappa" ->
      """WITH c AS (SELECT lang,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in)\b', 0)) AS c_en,
        |    len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en)\b', 0)) AS c_es,
        |    len(regexp_extract_all(lower(text), '\b(der|die|und|ist|das)\b', 0)) AS c_de,
        |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|dans)\b', 0)) AS c_fr
        |  FROM documents),
        |rated AS (SELECT
        |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
        |       WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
        |       WHEN c_de >= c_fr THEN 'de'
        |       ELSE 'fr' END AS ra,
        |  lang AS rb FROM c),
        |ct AS (SELECT ra, rb, COUNT(*) AS c FROM rated GROUP BY 1, 2),
        |tot AS (SELECT COALESCE(SUM(c), 0) AS n,
        |               COALESCE(SUM(CASE WHEN ra = rb THEN c END), 0) AS agree
        |        FROM ct),
        |rm AS (SELECT ra, SUM(c) AS r FROM ct GROUP BY ra),
        |cm AS (SELECT rb, SUM(c) AS cl FROM ct GROUP BY rb),
        |ch AS (SELECT COALESCE(SUM(COALESCE(rm.r, 0) * COALESCE(cm.cl, 0)), 0) AS chance_num
        |       FROM rm FULL OUTER JOIN cm ON rm.ra = cm.rb)
        |SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
        |  CAST(chance_num AS BIGINT) AS chance_num,
        |  CAST(n * agree - chance_num AS BIGINT) AS kappa_num,
        |  CAST(n * n - chance_num AS BIGINT) AS kappa_den
        |FROM tot, ch""".stripMargin)
}
