package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Session pattern matching, MATCH_RECOGNIZE-lite (SURVEY.md §2 row
  * 152) — the CEP capability Trino/Flink expose that Spark SQL lacks:
  * per match scope (a (user, session) pair, or a user's lifetime),
  * find the earliest in-order occurrence of a K-stage event pattern
  * (here view → click → purchase, each stage strictly after the
  * previous one's match) and report it WITH PROVENANCE — the matched
  * event ids and the end-to-end latency — not just the funnel's
  * corpus-level counts (q_funnel aggregates; this row answers "WHICH
  * events matched, and how fast, in THIS scope").
  *
  * Semantics (deterministic leftmost-earliest): t₁ = min ts of a
  * stage-1 event in the session; tₖ = min ts of a stage-k event with
  * ts > tₖ₋₁; the match exists iff every tₖ is defined. Stage event
  * ids tie-break on event_id at the matched timestamp. This is the
  * first match of the greedy DFA — the MATCH_RECOGNIZE subset that
  * stays exactly replayable in portable SQL (skip-past-last multi-
  * match needs recursion both engines would have to unroll).
  *
  * Scale shape: ONE exchange total. Every stage is a conditional MIN
  * over the SAME unordered session-partition window — K chained
  * projections over one hash-partitioned frame, no per-stage
  * self-joins (the K-way join formulation shuffles the events K
  * times), no ORDER BY sort at all (whole-partition frames). The
  * final per-session collapse groups on the window's own partition
  * keys, so ClusteredDistribution is already satisfied and the
  * groupBy reuses the exchange (spec-pinned: exactly one
  * hashpartitioning exchange). All outputs are integers (epoch
  * micros / ids), so oracle parity is hash-exact by construction.
  */
object Cep {

  /** Earliest in-order match of `stages` (event_type values) per
    * match scope (`scope` columns — (user_id, sess_id) for session
    * scope, user_id alone for lifetime scope). Output: one row per
    * matching scope with per-stage ts_k (epoch micros), id_k, and
    * latency_us. */
  def firstMatch(events: DataFrame, stages: Seq[String],
                 scope: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    require(scope.nonEmpty, "empty match scope")
    val w = Window.partitionBy(scope.map(col): _*)
    val withTs = stages.zipWithIndex.foldLeft(
      events.withColumn("__us", unix_micros(col("ts")))) {
      case (df, (stage, k)) =>
        val after: Column =
          if (k == 0) lit(true) else col("__us") > col(s"ts_${k - 1}")
        df.withColumn(s"ts_$k",
          min(when(col("event_type") === stage && after, col("__us"))).over(w))
    }
    val withIds = stages.indices.foldLeft(withTs) { (df, k) =>
      df.withColumn(s"id_$k",
        min(when(col("event_type") === stages(k) && col("__us") === col(s"ts_$k"),
          col("event_id"))).over(w))
    }
    val perStage = stages.indices.flatMap(k =>
      Seq(min(col(s"ts_$k")).as(s"ts_$k"), min(col(s"id_$k")).as(s"id_$k")))
    withIds
      .filter(col(s"ts_${stages.size - 1}").isNotNull)
      .groupBy(scope.map(col): _*)
      .agg(perStage.head, perStage.tail: _*)
      .withColumn("latency_us",
        col(s"ts_${stages.size - 1}") - col("ts_0"))
  }

  /** §2 row 152 — view → click → purchase per user lifetime (the sf
    * event stream averages one event per several hours, so 30-min
    * sessions are single-event; session scope is exercised by the
    * spec, lifetime scope by this gate). */
  def patternMatchQ(s: SparkSession, dir: String): DataFrame =
    firstMatch(Tables.events(s, dir),
        Seq("view", "click", "purchase"), Seq("user_id"))
      .orderBy(col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pattern_match" -> (patternMatchQ _))

  val oracles: Map[String, String] = Map(
    // one layered conditional-min CTE per stage (tₖ needs tₖ₋₁), one
    // ids layer, then the per-user collapse; everything stays BIGINT
    // (window MIN preserves the input type in DuckDB)
    "q_pattern_match" ->
      """WITH s AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |l0 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS ts_0 FROM s),
        |l1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > ts_0 THEN us END)
        |    OVER (PARTITION BY user_id) AS ts_1 FROM l0),
        |l2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > ts_1 THEN us END)
        |    OVER (PARTITION BY user_id) AS ts_2 FROM l1),
        |li AS (
        |  SELECT *,
        |    MIN(CASE WHEN event_type = 'view' AND us = ts_0 THEN event_id END)
        |      OVER (PARTITION BY user_id) AS id_0,
        |    MIN(CASE WHEN event_type = 'click' AND us = ts_1 THEN event_id END)
        |      OVER (PARTITION BY user_id) AS id_1,
        |    MIN(CASE WHEN event_type = 'purchase' AND us = ts_2 THEN event_id END)
        |      OVER (PARTITION BY user_id) AS id_2
        |  FROM l2)
        |SELECT user_id,
        |  MIN(ts_0) AS ts_0, MIN(id_0) AS id_0,
        |  MIN(ts_1) AS ts_1, MIN(id_1) AS id_1,
        |  MIN(ts_2) AS ts_2, MIN(id_2) AS id_2,
        |  MIN(ts_2) - MIN(ts_0) AS latency_us
        |FROM li
        |WHERE ts_2 IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
