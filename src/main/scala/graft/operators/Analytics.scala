package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Behavioral-analytics operators over the events stream: ordered
  * funnels, retention cohorts, and event-to-interval joins — the query
  * shapes a health/product ETL warehouse answers daily.
  *
  * Scale posture: every operator is grouped-aggregation-shaped on
  * user_id (or an equi key + range residual for the interval join) —
  * partial aggregation runs map-side, the shuffle carries one row per
  * user (or per matched pair), never raw events twice.
  */
object Analytics {

  /** q_funnel — ordered view → click → purchase conversion. A user
    * counts for a stage only if the stage event happens strictly AFTER
    * their entry into the previous stage (min-ts semantics). */
  def funnelQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** q_retention — classic cohort grid: users by first-seen day,
    * re-activity by day offset. */
  def retentionQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val active = ev.distinct()
    active.join(firstDay, "user_id")
      .groupBy(col("cohort_day"),
        datediff(to_date(col("day")), to_date(col("cohort_day"))).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** q_interval_join — events landing inside a per-purchase window
    * [purchase_ts, purchase_ts + 2h) of the same user. Planned as an
    * equi join on the user key with the range term as residual —
    * shuffles once on user_id, never builds a time cross product. */
  def intervalJoinQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("value"))
    val win = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("win_id"), col("user_id").as("w_user"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    ev.join(win,
        col("user_id") === col("w_user") &&
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("window_value"))
      .orderBy(col("win_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"        -> (funnelQ _),
    "q_retention"     -> (retentionQ _),
    "q_interval_join" -> (intervalJoinQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |  (SELECT COUNT(*) FROM c) AS n_click_after_view,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_after_click""".stripMargin,

    "q_retention" ->
      """WITH f AS (
        |  SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS cohort_day
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events)
        |SELECT cohort_day,
        |  CAST(datediff('day', CAST(cohort_day AS DATE), CAST(day AS DATE)) AS INT) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q_interval_join" ->
      """SELECT win_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS window_value
        |FROM events e JOIN (
        |  SELECT event_id AS win_id, user_id AS w_user, ts AS w_start,
        |    ts + INTERVAL 2 HOUR AS w_end
        |  FROM events WHERE event_type = 'purchase') w
        |  ON e.user_id = w.w_user
        | AND e.ts >= w.w_start
        | AND e.ts < w.w_end
        |GROUP BY win_id
        |ORDER BY win_id""".stripMargin,
  )
}
