package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Session→training-document assembly (SURVEY.md §2 row 151) — the op
  * that turns an interaction/event STREAM into the ordered text
  * DOCUMENTS an LLM trains on (chat threading, clickstream-to-context,
  * log-to-trace): per (user, session), every event rendered as one
  * deterministic line, lines joined in strict (ts, event_id) order.
  * Upstream of every text op in this library — once assembled, the
  * dedup/quality/pack rows treat the result as ordinary documents.
  *
  * Scale shape: ONE shuffle total. The session window partitions by
  * user (the sessionize posture, same >gap break rule as §2.2#31,
  * shared via [[withSessionIds]]); the per-session aggregation's
  * ClusteredDistribution(user, sess) is already satisfied by
  * HashPartitioning(user) — a subset of the grouping keys — so
  * Catalyst reuses the exchange and the groupBy adds NO second
  * shuffle. In-group ordering is array_sort over (us, event_id, line)
  * structs, not a second window sort.
  *
  * Memory contract: the aggregation buffers one SESSION's lines, not
  * a user's history — sessions are bounded by the gap rule, and a
  * pathological always-on key should be split downstream by the
  * chunking op (row: Chunking) rather than widening this buffer.
  *
  * Determinism: values render through DECIMAL(12,2) → string, so both
  * engines print "1.50", never the engine-specific double repr; ties
  * in ts break on event_id.
  */
object Assembly {

  /** Events tagged with `sess_id`: a session break is a gap of more
    * than `gapMinutes` between a user's consecutive events. */
  def withSessionIds(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60 * 1000000
    events
      .withColumn("__prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("__new_sess",
        when(col("__prev_us").isNull ||
          unix_micros(col("ts")) - col("__prev_us") > gapMicros, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("__new_sess")).over(w))
      .drop("__prev_us", "__new_sess")
  }

  /** One document per (user_id, sess_id): `doc` is the newline-joined
    * event lines in (ts, event_id) order, plus n_events/n_chars. */
  def assemble(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    withSessionIds(events, gapMinutes)
      .withColumn("__line", concat_ws("|", col("event_type"),
        col("value").cast("decimal(12,2)").cast("string")))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              unix_micros(col("ts")).as("us"),
              col("event_id").as("eid"),
              col("__line").as("l")))),
            x => x.getField("l")),
          "\n").as("doc"))
      .withColumn("n_chars", length(col("doc")).cast("long"))

  /** §2 row 151 registered query. */
  def assembleQ(s: SparkSession, dir: String): DataFrame =
    assemble(Tables.events(s, dir))
      .orderBy(col("user_id"), col("sess_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assemble_sessions" -> (assembleQ _))

  val oracles: Map[String, String] = Map(
    // the q_sessionize CTE pair (same break rule) + ordered string_agg;
    // window SUM is HUGEINT in DuckDB -> explicit BIGINT casts
    "q_assemble_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    CAST(SUM(new_sess) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_id
        |  FROM g),
        |d AS (
        |  SELECT user_id, sess_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    string_agg(
        |      event_type || '|' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR),
        |      chr(10) ORDER BY ts, event_id) AS doc
        |  FROM s GROUP BY user_id, sess_id)
        |SELECT user_id, sess_id, n_events, doc,
        |  CAST(length(doc) AS BIGINT) AS n_chars
        |FROM d
        |ORDER BY user_id, sess_id""".stripMargin,
  )
}
