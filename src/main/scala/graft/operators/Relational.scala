package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Relational core of the engine (SURVEY.md §2.2).
  *
  * Every query here is a declarative DataFrame plan — Catalyst handles
  * predicate/projection pushdown into the parquet scans, AQE handles
  * runtime re-planning. Dim tables (region/nation/supplier) are hinted
  * `broadcast`; fact⋈fact joins shuffle on their keys once.
  *
  * Oracle-parity rules (SURVEY.md §5): money-ish doubles are summed
  * through exact DECIMAL casts and only converted to DOUBLE at the end,
  * so aggregation order (which differs between Spark partitions and
  * DuckDB) cannot change the result bit pattern. Row order is pinned
  * with explicit total orderings.
  */
object Relational {

  /** Exact-money cast: decimal(12,2) survives sums to precision 22. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rate cast (discount/tax in [0,1]). */
  def dec4(c: Column): Column = c.cast(DecimalType(9, 4))
  /** Exact revenue term: price * (1 - discount), all decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - dec4(discount))

  /** §2.2#16 — projection + selective predicate; both must reach the scan. */
  def readProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast(TimestampType) &&
              col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** §2.2#17 — grouped aggregation over the fact table (TPC-H Q1 shape).
    * One shuffle (partial agg map-side, final agg on group keys). */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec4(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** §2.2#20 — top-N revenue orders for a segment (TPC-H Q3 shape).
    * customer is filtered then joined (AQE may broadcast it at small SF;
    * at 100 TB it shuffles on the join key, which is correct for a
    * fact-sized dim). */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li   = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-03-15").cast(TimestampType))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** §2.2#18 — five-way join, revenue by nation (TPC-H Q5 shape).
    * region/nation are FIXED-cardinality dims → explicit broadcast;
    * supplier grows with scale factor, so it is left to AQE (which
    * broadcasts it at small SF and shuffles it at 100 TB — a forced
    * hint would blow the build side past executor heap there). */
  def q5NationRevenue(s: SparkSession, d: String): DataFrame = {
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("o_orderdate") <  lit("1998-01-01").cast(TimestampType))
    val li = Tables.lineitem(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** §2.2#19 — selective filter + single aggregate (TPC-H Q6 shape). */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") <  lit("1997-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum((dec2(col("l_extendedprice")) * dec4(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** §2.2#21 — rank within group: top 3 orders per customer. */
  def topNPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("c_custkey"), col("rn"))
  }

  /** §2.2#22 — per-user daily totals + running cumulative sum.
    * Daily partial agg first (shrinks the window input), then one
    * window sort per user — the scalable order for 100 TB of events. */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("dsum"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    daily
      .withColumn("running_value", sum(col("dsum")).over(w).cast(DoubleType))
      .withColumn("day_value", col("dsum").cast(DoubleType))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("day_value"), col("running_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** §2.2#23 — lag/delta per user ordered by event time. */
  def lagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"), col("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** §2.2#24 — semi join: customers having at least one URGENT order. */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** §2.2#25 — anti join: customers with no orders at all. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** §2.2#26 — rollup over flag/status with subtotals + grand total. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** §2.2#27 — exact distinct counts over the fact table. */
  def distinctCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** §2.2#28 — approximate distinct via the deterministic HLL register
    * aggregate. ORACLE-BACKED since round 15 (round-14 verdict item
    * 1): the gate surface is the REGISTER image per group — reg_sum
    * (sum of the m=64 registers) and n_filled (non-zero registers),
    * both exact integers a SQL replay reproduces bit-for-bit from the
    * PolyHash64 stream — next to the exact count. The float harmonic-
    * mean estimate (and Spark's own approx_count_distinct) stays
    * spec-pinned in ChunkSketchSpec: estimates are engine-specific,
    * registers are not. Scale shape unchanged: constant 64-byte state
    * per map task, elementwise-max merge. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_partkey").cast(StringType).as("__item"))
      .groupBy(col("l_returnflag"))
      .agg(graft.plans.HllRegistersAgg.hll_registers(col("__item"), 6).as("__regs"),
           countDistinct(col("__item")).as("exact_parts"))
      .select(col("l_returnflag"),
        aggregate(col("__regs"), lit(0L), (acc, r) => acc + r).as("reg_sum"),
        aggregate(col("__regs"), lit(0L),
          (acc, r) => acc + when(r > 0, 1L).otherwise(0L)).as("n_filled"),
        col("exact_parts"))
      .orderBy(col("l_returnflag"))

  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** §2.2#29 — per-day wide pivot on event_type (explicit value list, so
    * no extra distinct-values job; one shuffle). */
  def pivotEvents(s: SparkSession, d: String): DataFrame = {
    val pivoted = Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("v"))
    val outCols = col("day") +: eventTypes.flatMap(t => Seq(
      coalesce(col(s"${t}_n"), lit(0L)).as(s"${t}_n"),
      col(s"${t}_v").cast(DoubleType).as(s"${t}_v")))
    pivoted.select(outCols: _*).orderBy(col("day"))
  }

  /** §2.2#30 — tumbling 1-hour aggregation (batch twin of the streaming
    * path in graft.streaming.EventStream). */
  def hourlyEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      // the hour bucket is emitted as a formatted string so the output
      // type is precision-unambiguous (parquet ns vs us drift otherwise)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  /** §2.2#31 — sessionization: a session break is a >30-minute gap.
    * Two window passes over one user-partitioned sort (Spark reuses the
    * partitioning; single shuffle). */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = 30L * 60 * 1000000
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec2(col("value"))).cast(DoubleType).as("sess_value"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Native session-window aggregation (SURVEY.md §2 row 217) — the
    * same gap-sessionization semantics as [[sessionize]], expressed
    * through Spark's BUILT-IN `session_window` grouping (the §4
    * preference order's first rung: compose existing operators before
    * hand-rolling). The built-in carries planner knowledge the manual
    * lag/cumsum formulation cannot: it feeds Structured Streaming's
    * native session-window state store unchanged (the batch and
    * streaming plans share the operator), and it needs NO window
    * function — one groupBy with a session key. Boundary contract:
    * Spark merges an event into the session while ts − last < gap
    * (break at ≥), one tick stricter than [[sessionize]]'s break at >;
    * both are valid conventions — this row pins the BUILT-IN's.
    * Session end = last event + gap by definition (the streaming-
    * compatible end, known at watermark time).
    *
    * Scale shape: one shuffle on user_id, sessions assembled inside
    * the aggregation — no per-user sort window, map-side partial
    * session merge. */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("sess_value"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"), col("sess_value"))
      .orderBy(col("user_id"), col("sess_start"))

  /** Sliding-window event rates via the native `window()` grouping
    * (SURVEY.md §2 row 219) — the OVERLAPPING-window companion to the
    * tumbling hourly rollup (row 30): monitoring and rate-limiting
    * read "events in the last hour, updated every 15 minutes", and the
    * tumbling bucket systematically under-reports bursts that straddle
    * a boundary. The built-in generates each event's l/s covering
    * windows (4 here) inside the aggregation — the same operator
    * Structured Streaming uses with a watermark, so the batch query
    * IS the streaming query's semantics on a bounded prefix. Window
    * origin is epoch-aligned (pinned by the oracle's floor-div
    * replay).
    *
    * Scale shape: one groupBy whose key fan-out is the fixed l/s
    * factor (map-side combined); no self-joins, no per-event explode
    * in user space. */
  def slidingRates(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start_us"),
        unix_micros(col("w.end")).as("win_end_us"),
        col("event_type"), col("n"))
      .orderBy(col("win_start_us"), col("event_type"))

  /** §2.2#32 — as-of join: each event picks the latest order of the same
    * customer with o_orderdate <= ts.
    *
    * Spark-first plan: tag + union + one window over (user, time) — a
    * single sort-shuffle, no per-row point lookups and no non-equi join
    * fan-out. This is the 100 TB-safe formulation: cost is one shuffle
    * of |events|+|orders| regardless of how many orders precede each
    * event, where a naive range join is quadratic in the worst case. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id").as("u"), col("ts").as("t"),
        lit(1).as("tag"), col("event_id"),
        lit(null).cast(LongType).as("o_orderkey"),
        lit(null).cast(TimestampType).as("o_orderdate"))
    val ord = Tables.orders(s, d)
      .select(col("o_custkey").as("u"), col("o_orderdate").as("t"),
        lit(0).as("tag"), lit(null).cast(LongType).as("event_id"),
        col("o_orderkey"), col("o_orderdate"))
    // At equal t, orders sort before events (tag 0 < 1) so the order is
    // visible to an event at the same instant; among equal-t orders the
    // highest orderkey wins (last in sort order).
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("tag"), coalesce(col("o_orderkey"), lit(Long.MinValue)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("u").as("user_id"),
        col("asof_orderkey"),
        // formatted string: precision-unambiguous across parquet readers
        date_format(col("asof_orderdate"), "yyyy-MM-dd HH:mm:ss").as("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  /** §2.2#33 — conformed UNION ALL of two entity types + aggregate. */
  def unionTypes(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("amount"),
        lit("order").as("kind"))
    val ev = Tables.events(s, d)
      .select(col("event_id").as("id"), col("value").as("amount"),
        lit("event").as("kind"))
    ord.unionByName(ev)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("amount"))).cast(DoubleType).as("total"))
      .orderBy(col("kind"))
  }

  /** Module oracles (most §2.2 oracles live inline in SparkEntry; this
    * map exists for the ones needing the shared SQL hash fragments). */
  val oracles: Map[String, String] = Map(
    // register-level HLL replay per group: the q_hll_registers
    // bucket/rho fragment over the distinct (flag, partkey) pairs,
    // collapsed to the (reg_sum, n_filled) integer image; p = 6 →
    // m = 64 buckets, rhoCap = 59
    "q_approx_distinct" ->
      s"""WITH iv AS (
         |  SELECT DISTINCT l_returnflag AS grp, CAST(l_partkey AS VARCHAR) AS item
         |  FROM lineitem),
         |ivd AS (SELECT DISTINCT item FROM iv),
         |hs AS (${TrainingOps.polyHashSql("hll|", "ivd", "item")}),
         |hr AS (
         |  SELECT item, CAST(((h % 64) + 64) % 64 AS BIGINT) AS bucket,
         |    CAST(CASE WHEN w = 0 THEN 59
         |         ELSE bit_count((w & (-w)) - 1) + 1 END AS BIGINT) AS rho
         |  FROM (
         |    SELECT item, h, CAST(
         |      (CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + 18446744073709551616
         |            ELSE CAST(h AS HUGEINT) END) // 64 AS BIGINT) AS w
         |    FROM hs) _w),
         |g AS (
         |  SELECT iv.grp, r.bucket, MAX(r.rho) AS reg
         |  FROM iv JOIN hr r USING (item) GROUP BY 1, 2),
         |gs AS (
         |  SELECT grp, CAST(SUM(reg) AS BIGINT) AS reg_sum,
         |    CAST(COUNT(*) AS BIGINT) AS n_filled
         |  FROM g GROUP BY grp),
         |x AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS exact_parts FROM iv GROUP BY grp)
         |SELECT gs.grp AS l_returnflag, gs.reg_sum, gs.n_filled, x.exact_parts
         |FROM gs JOIN x USING (grp)
         |ORDER BY l_returnflag""".stripMargin,
  )
}
