package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (coverage checklist) and
  * §5 (oracle-parity rules). Every implemented operator is registered in
  * [[queries]]; SQL-expressible ones also carry a DuckDB oracle in
  * [[oracleSql]] with identical column names and row order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_combined_daily")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational core
    "q_read_project"      -> (Relational.readProject _),
    "q1_pricing_summary"  -> (Relational.q1PricingSummary _),
    "q3_top_orders"       -> (Relational.q3TopOrders _),
    "q5_nation_revenue"   -> (Relational.q5NationRevenue _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q_topn_per_group"    -> (Relational.topNPerGroup _),
    "q_running_total"     -> (Relational.runningTotal _),
    "q_lag_delta"         -> (Relational.lagDelta _),
    "q_semi_join"         -> (Relational.semiJoin _),
    "q_anti_join"         -> (Relational.antiJoin _),
    "q_rollup"            -> (Relational.rollupAgg _),
    "q_distinct_count"    -> (Relational.distinctCount _),
    "q_approx_distinct"   -> (Relational.approxDistinct _),
    "q_pivot_events"      -> (Relational.pivotEvents _),
    "q_hourly_events"     -> (Relational.hourlyEvents _),
    "q_sessionize"        -> (Relational.sessionize _),
    "q_session_window"    -> (Relational.sessionWindow _),
    "q_sliding_rates"     -> (Relational.slidingRates _),
    "q_asof_join"         -> (Relational.asofJoin _),
    "q_union_types"       -> (Relational.unionTypes _),
  ) ++ Relational2.queries ++ Relational3.queries ++ Etl.queries ++ TextOps.queries ++
    VectorQueries.queries ++ CustomOps.queries ++ Curation.queries ++
    Chunking.queries ++ SketchOps.queries ++ AsOfJoinOp.queries ++
    Cdc.queries ++ Analytics.queries ++ Sampling.queries ++ TextOps2.queries ++
    Fuzzy.queries ++ Profiling.queries ++ TrainingOps.queries ++ CorpusOps.queries ++
    HeavyHitters.queries ++ TrainingPipeline.queries ++ LmScore.queries ++
    SubstringDedup.queries ++ SemDedup.queries ++ MixtureOps.queries ++
    PqIndex.queries ++ ScalarQuant.queries ++ ClusterOps.queries ++ GraphOps.queries ++ GraphState.queries ++ NoveltyState.queries ++
    BpeOps.queries ++ Classify.queries ++ Contamination.queries ++
    Boilerplate.queries ++ Dsir.queries ++ Fusion.queries ++ Blocklist.queries ++
    Dq.queries ++ Assembly.queries ++ Cep.queries ++ Privacy.queries ++ Hygiene.queries ++
    SpanCorrupt.queries ++ Regression.queries ++ PcaOps.queries ++ Bm25State.queries ++
    Agreement.queries ++ PhraseSearch.queries ++ Rake.queries ++ AssocRules.queries ++
    Percolate.queries ++ CodeSwitch.queries ++ Stitch.queries ++
    Weak.queries ++ Placement.queries ++ Markup.queries ++ Urls.queries ++
    UnigramTok.queries ++ TokEval.queries ++ Robots.queries ++
    WarcOps.queries ++ CorpusOverlap.queries ++ SuffixOps.queries ++ CrawlState.queries ++ CrawlCycle.queries ++ WebIr.queries ++ OverlapEval.queries ++ WebIndex.queries ++
    HttpCache.queries ++ ZOrder.queries ++ Markdown.queries ++ BandJoin.queries ++
    ScanOps.queries ++
    graft.sources.ExtractClient.queries

  /** DuckDB oracles. Decimal-exact aggregation (SURVEY §5) keeps doubles
    * bit-identical across engines; ORDER BY pins row order. */
  def oracleSql: Map[String, String] = Map(
    "q_read_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_topn_per_group" ->
      """SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY c_custkey, rn""".stripMargin,

    "q_running_total" ->
      """WITH daily AS (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |    SUM(CAST(value AS DECIMAL(12,2))) AS dsum
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day,
        |  CAST(dsum AS DOUBLE) AS day_value,
        |  CAST(SUM(dsum) OVER (PARTITION BY user_id ORDER BY day) AS DOUBLE) AS running_value
        |FROM daily
        |ORDER BY user_id, day""".stripMargin,

    "q_lag_delta" ->
      """SELECT user_id, event_id, value,
        |  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_distinct_count" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    "q_pivot_events" -> {
      val per = Relational.eventTypes.map { t =>
        s"""  COUNT(*) FILTER (WHERE event_type = '$t') AS ${t}_n,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) FILTER (WHERE event_type = '$t') AS DOUBLE) AS ${t}_v""".stripMargin
      }.mkString(",\n")
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
         |$per
         |FROM events
         |GROUP BY 1
         |ORDER BY day""".stripMargin
    },

    "q_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, value, ts, event_id,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_id
        |  FROM g)
        |SELECT user_id, sess_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sess_value
        |FROM s
        |GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,

    // the built-in session_window's boundary convention: sessions are
    // [start, last+gap) and merge while they overlap OR TOUCH, so the
    // break is strictly gap > 30 min (same as q_sessionize — pinned by
    // SessionWindowSpec's exact-gap case); end = last event + gap;
    // ts-only ordering (boundaries don't need the event_id tiebreak —
    // equal ts always co-sessions)
    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, value, ts,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, value, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS sess_id
        |  FROM g)
        |SELECT user_id,
        |  MIN(ts) AS sess_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sess_value
        |FROM s
        |GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,

    // each event's 4 covering windows: epoch-aligned floor to the
    // 15-min slide minus j slides, j = 0..3 (every one satisfies
    // ws > ts - 1h by construction at l/s = 4); micros on the wire
    "q_sliding_rates" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |w AS (
        |  SELECT event_type,
        |    (us // 900000000) * 900000000 - j.j * 900000000 AS ws
        |  FROM e, LATERAL (SELECT unnest(range(0, 4)) AS j) j)
        |SELECT ws AS win_start_us,
        |  CAST(ws + 3600000000 AS BIGINT) AS win_end_us,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM w GROUP BY ws, event_type
        |ORDER BY win_start_us, event_type""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, user_id, asof_orderkey,
        |  strftime(asof_orderdate, '%Y-%m-%d %H:%M:%S') AS asof_orderdate FROM (
        |  SELECT e.event_id, e.user_id,
        |    o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q_union_types" ->
      """SELECT kind, COUNT(*) AS n,
        |  CAST(SUM(CAST(amount AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey AS id, o_totalprice AS amount, 'order' AS kind FROM orders
        |  UNION ALL
        |  SELECT event_id, value, 'event' FROM events) u
        |GROUP BY kind
        |ORDER BY kind""".stripMargin,
  ) ++ Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++ Etl.oracles ++ TextOps.oracles ++
    VectorQueries.oracles ++ CustomOps.oracles ++ Curation.oracles ++
    Chunking.oracles ++ AsOfJoinOp.oracles ++
    Cdc.oracles ++ Analytics.oracles ++ Sampling.oracles ++ TextOps2.oracles ++
    Fuzzy.oracles ++ Profiling.oracles ++ TrainingOps.oracles ++ CorpusOps.oracles ++
    HeavyHitters.oracles ++ TrainingPipeline.oracles ++ LmScore.oracles ++
    SubstringDedup.oracles ++ SemDedup.oracles ++ MixtureOps.oracles ++
    PqIndex.oracles ++ ScalarQuant.oracles ++ ClusterOps.oracles ++ GraphOps.oracles ++ GraphState.oracles ++ NoveltyState.oracles ++
    BpeOps.oracles ++ Classify.oracles ++ Contamination.oracles ++
    Boilerplate.oracles ++ Dsir.oracles ++ SketchOps.oracles ++ Fusion.oracles ++ Blocklist.oracles ++
    Dq.oracles ++ Assembly.oracles ++ Cep.oracles ++ Privacy.oracles ++ Hygiene.oracles ++
    SpanCorrupt.oracles ++ Regression.oracles ++ PcaOps.oracles ++ Bm25State.oracles ++
    Agreement.oracles ++ PhraseSearch.oracles ++ Rake.oracles ++ AssocRules.oracles ++
    Percolate.oracles ++ CodeSwitch.oracles ++ Stitch.oracles ++
    Weak.oracles ++ Placement.oracles ++ Markup.oracles ++ Urls.oracles ++
    UnigramTok.oracles ++ TokEval.oracles ++ Robots.oracles ++
    WarcOps.oracles ++ CorpusOverlap.oracles ++ SuffixOps.oracles ++ CrawlState.oracles ++ CrawlCycle.oracles ++ WebIr.oracles ++ OverlapEval.oracles ++ WebIndex.oracles ++
    HttpCache.oracles ++ ZOrder.oracles ++ Markdown.oracles ++ BandJoin.oracles ++
    ScanOps.oracles ++
    graft.sources.ExtractClient.oracles
}
