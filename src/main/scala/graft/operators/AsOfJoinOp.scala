package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
import graft.sources.Tables

/** DataFrame API over the native as-of join operator (graft.plans).
  * Key/time/tiebreak columns must be LONG (encode timestamps with
  * unix_micros beforehand).
  */
object AsOfJoinOp {

  private def attr(p: LogicalPlan, name: String) = {
    val a = p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not found in ${p.output.map(_.name).mkString(",")}"))
    // The exec compares via getLong — any other type would be read as
    // raw bits and merge on garbage ordering. Fail fast instead.
    require(a.dataType == org.apache.spark.sql.types.LongType,
      s"as-of join key/time/tie column $name must be LONG, got ${a.dataType}")
    a
  }

  /** Backward as-of join: each left row gets the LAST right row with
    * the same key and right.time <= left.time, but no older than
    * `toleranceMicros` (pandas merge_asof semantics; default =
    * unbounded). */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String, rightTie: String,
           toleranceMicros: Long = Long.MaxValue): DataFrame = {
    val spark = left.sparkSession
    ColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    val lp = ColumnBridge.logicalPlan(left)
    // Self-as-of-join: Spark's analyzer only de-duplicates conflicting
    // expression IDs for built-in Join nodes, so a shared-lineage right
    // side would carry the SAME exprIds as the left and bindings could
    // silently resolve to the wrong side. Re-aliasing every column
    // mints fresh exprIds for the right output.
    val rp0 = ColumnBridge.logicalPlan(right)
    val rp =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else ColumnBridge.logicalPlan(
        right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(lp, leftTime),
      attr(rp, rightKey), attr(rp, rightTime), attr(rp, rightTie),
      toleranceMicros))
  }

  /** Forward as-of join: the FIRST right row with right.time >=
    * left.time (within tolerance). Implemented by time negation over
    * the backward exec — t >= lt ⟺ -t <= -lt, and "first ascending"
    * becomes "last descending" — so one exec serves both directions. */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTime: String,
                  rightKey: String, rightTime: String, rightTie: String,
                  toleranceMicros: Long = Long.MaxValue): DataFrame = {
    val negL = left.withColumn("__negt", -col(leftTime))
    val negR = right.withColumn("__negrt", -col(rightTime))
      .withColumn("__negtie", -col(rightTie))
    asof(negL, negR, leftKey, "__negt", rightKey, "__negrt", "__negtie",
        toleranceMicros)
      .drop("__negt", "__negrt", "__negtie")
  }

  /** Same semantics (and same oracle) as Relational.asofJoin, executed
    * by the native AsOfJoinExec instead of the union-tag window. */
  def asofNativeQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    // o_orderdate infers as TIMESTAMP_NTZ from parquet; session TZ is
    // UTC so the cast is value-preserving
    val ord = Tables.orders(s, d).select(
      col("o_custkey").as("ord_user"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
      col("o_orderkey"), col("o_orderdate"))
    asof(ev, ord, "user_id", "t_us", "ord_user", "o_us", "o_orderkey")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"), col("o_orderdate").as("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  /** q_asof_tolerance — each click's most recent purchase by the same
    * user within 1 day (native exec, bounded-staleness semantics). */
  def asofToleranceQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"),
        col("event_id").as("p_id"))
    asof(clicks, purchases, "user_id", "t_us", "p_user", "p_us", "p_id",
        toleranceMicros = 86400L * 1000000L)
      .select(col("event_id"), col("user_id"),
        col("p_id").as("purchase_id"), col("p_us").as("purchase_t_us"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_native"    -> (asofNativeQ _),
    "q_asof_tolerance" -> (asofToleranceQ _),
  )

  /** The native operator answers the same question as q_asof_join. */
  val oracles: Map[String, String] = Map(
    "q_asof_native" ->
      """SELECT event_id, user_id, asof_orderkey, asof_orderdate FROM (
        |  SELECT e.event_id, e.user_id,
        |    o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q_asof_tolerance" ->
      """SELECT event_id, user_id, purchase_id, purchase_t_us FROM (
        |  SELECT c.event_id, c.user_id,
        |    p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_t_us,
        |    ROW_NUMBER() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts
        |   AND epoch_us(c.ts) - epoch_us(p.ts) <= 86400000000) t
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
  )
}
