package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Change-data-capture shapes the reference's append-only warehouse
  * implies but never implements (ref: etl/load.py:184-207 appends and
  * detects duplicate days AFTER the fact — these operators resolve them
  * declaratively): latest-record-wins upsert merge and SCD2 validity
  * intervals.
  *
  * Scale posture: both are one shuffle on the merge key (window over
  * key). At 100 TB the base side would be a bucketed/clustered table so
  * the window sort reuses the layout; nothing here depends on data
  * volume beyond that single exchange.
  */
object Cdc {

  /** Latest-wins merge: union base + updates, keep the newest row per
    * key by (version, tiebreaks) descending. */
  def upsert(base: DataFrame, updates: DataFrame,
             keys: Seq[String], versionCol: String,
             tiebreaks: Seq[String]): DataFrame = {
    val u = base.unionByName(updates)
    val ord = (col(versionCol).desc +: tiebreaks.map(col(_).desc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD2: turn a change log into validity intervals — each change row
    * is valid from its own timestamp until the next change of the same
    * key (null = still current). */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tiebreak))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** q_merge_upsert — two event streams ('view' = base snapshot,
    * 'click' = update feed) merged latest-wins per (user, day). */
  def mergeUpsertQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val base = ev.filter(col("event_type") === "view")
      .withColumn("src", lit("base"))
    val updates = ev.filter(col("event_type") === "click")
      .withColumn("src", lit("update"))
    upsert(base, updates, Seq("user_id", "day"), "ts", Seq("event_id"))
      .select(col("user_id"), col("day"), col("event_id"), col("value"), col("src"))
      .orderBy(col("user_id"), col("day"))
  }

  /** q_scd2 — order-status change log per customer as validity ranges. */
  def scd2Q(s: SparkSession, d: String): DataFrame =
    scd2(Tables.orders(s, d), Seq("o_custkey"), "o_orderdate", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> (mergeUpsertQ _),
    "q_scd2"         -> (scd2Q _),
  )

  val oracles: Map[String, String] = Map(
    "q_merge_upsert" ->
      """SELECT user_id, day, event_id, value, src FROM (
        |  SELECT user_id, day, event_id, value, src,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM (
        |    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, ts, event_id, value,
        |      'base' AS src FROM events WHERE event_type = 'view'
        |    UNION ALL
        |    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, ts, event_id, value,
        |      'update' AS src FROM events WHERE event_type = 'click') u) t
        |WHERE rn = 1
        |ORDER BY user_id, day""".stripMargin,

    "q_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |  o_orderdate AS valid_from,
        |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to
        |FROM orders
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
  )
}
