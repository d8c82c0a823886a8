package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable-sketch operators (SURVEY.md §9): Spark's Datasketches HLL
  * builtins. The point at 100 TB: per-day sketches are small, stored,
  * and UNIONED — "distinct users this quarter" reads 90 sketch rows
  * instead of rescanning a quarter of raw events. Spark-first: all
  * builtins, no custom code needed.
  */
object SketchOps {

  /** Per-day HLL sketches of the user population. */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
           count(lit(1)).as("n_events"))

  /** Union the daily sketches → overall distinct estimate (the
    * incremental path), next to the exact answer for reference. */
  def hllUsersQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val merged = dailyUserSketches(ev)
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("approx_users"),
           count(lit(1)).as("n_days"))
    val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact)
  }

  /** §2.11 — count-min estimates vs exact counts for the top-20 tokens.
    * Width 16 over a larger vocabulary FORCES collisions: the estimates
    * genuinely overcount, and the oracle replays the overcounts exactly
    * (the sketch is deterministic, collisions included). */
  def cmsTokensQ(s: SparkSession, d: String): DataFrame = {
    import graft.plans.CountMinAgg
    val toks = Tables.documents(s, d)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    val sketch = toks.agg(CountMinAgg.count_min(col("t"), CmsD, CmsW).as("sk"))
    toks.groupBy(col("t")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est", CountMinAgg.estimate(col("sk"), col("t"), CmsD, CmsW))
      .select(col("t").as("token"), col("est"), col("exact"))
      .orderBy(col("exact").desc, col("token"))
      .limit(20)
  }

  private val CmsD = 4
  private val CmsW = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hll_users"  -> (hllUsersQ _), // rows-only: estimate is engine-specific
    "q_cms_tokens" -> (cmsTokensQ _),
  )

  /** HUGEINT replay of the whole sketch: per-row domain-prefixed
    * poly-hash buckets over the distinct vocabulary, bucket sums, min
    * over rows — insert and probe share the hash stream by
    * construction. */
  val oracles: Map[String, String] = Map(
    "q_cms_tokens" -> {
      // the id column must not be named `t` — polyHashSql aliases its
      // prefixed string internally as t and the names would collide
      val hashRows = (0 until CmsD).map { r =>
        s"SELECT $r AS r, tok, h FROM (${TrainingOps.polyHashSql(s"cms$r|", "(SELECT DISTINCT tok FROM toks)", "tok")}) _h$r"
      }.mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS tok FROM documents),
         |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM toks GROUP BY tok),
         |hs AS (
         |  $hashRows),
         |bk AS (SELECT r, tok, ((h % $CmsW) + $CmsW) % $CmsW AS b FROM hs),
         |cell AS (SELECT bk.r, bk.b, sum(tc.exact) AS s
         |         FROM bk JOIN tc USING (tok) GROUP BY bk.r, bk.b),
         |est AS (SELECT bk.tok, CAST(min(cell.s) AS BIGINT) AS est
         |        FROM bk JOIN cell ON bk.r = cell.r AND bk.b = cell.b GROUP BY bk.tok)
         |SELECT tc.tok AS token, est.est AS est, tc.exact AS exact
         |FROM tc JOIN est ON tc.tok = est.tok
         |ORDER BY exact DESC, token LIMIT 20""".stripMargin
    },
  )
}
