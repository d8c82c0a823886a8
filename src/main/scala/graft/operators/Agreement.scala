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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cohen_kappa" -> (kappaQ _))

  val oracles: Map[String, String] = Map(
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
