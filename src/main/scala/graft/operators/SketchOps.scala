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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hll_users" -> (hllUsersQ _), // rows-only: estimate is engine-specific
  )
}
