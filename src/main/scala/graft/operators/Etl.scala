package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{SchemaAlign, Tables}

/** SURVEY.md §2.1 — the reference's ETL capabilities as registered
  * queries over the synthetic tables. The `events` table plays the role
  * of the reference's raw detail streams (heartrate etc.); per-day
  * aggregation of it mirrors the daily health-record model.
  */
object Etl {

  import Relational.dec2

  /** Day as a `yyyy-MM-dd` string: DATE columns round-trip differently
    * through parquet/pandas/DuckDB (date32 vs datetime64), so oracle-
    * checked outputs carry days as ISO strings — unambiguous under any
    * comparator, same sort order. Internal date arithmetic still uses
    * real DateType. */
  private def day = date_format(col("ts"), "yyyy-MM-dd").as("day")

  /** §2.1#2 — watermark incremental: "existing" = events before
    * 2024-01-21; new rows are those with day strictly after the max
    * landed day (extract.py:170-177). */
  def incrementalWatermark(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
    val existing = ev.filter(col("ts") < lit("2024-01-21").cast(TimestampType))
    Incremental.newerThanWatermark(ev, existing, "day")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** §2.1#3 — 7-day chunk assignment from a fixed anchor
    * (extract.py:133-149). */
  def chunkedRanges(s: SparkSession, d: String): DataFrame =
    Incremental.withChunk(
        Tables.events(s, d).withColumn("day", to_date(col("ts"))),
        col("day"), lit("2024-01-01").cast(DateType), 7)
      .groupBy(col("chunk"))
      .agg(date_format(min(col("day")), "yyyy-MM-dd").as("chunk_start"),
           count(lit(1)).as("n"))
      .orderBy(col("chunk"))

  /** §2.1#4 — JSON props flattened to `props__k` (transform.py:38-52).
    * The library path parses to a struct and runs [[Flatten.flatten]];
    * equivalent to a direct get_json_object, but exercises the
    * struct-recursive flatten. */
  def flattenJson(s: SparkSession, d: String): DataFrame = {
    val parsed = Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("props"))
    Flatten.flatten(parsed)
      .select(col("event_id"), col("props__k"))
      .orderBy(col("event_id"))
  }

  /** §2.1#5 — string→date parse/validate (transform.py:17-22): round-trip
    * ts through its string form, reject unparseable. */
  def dayParse(s: SparkSession, d: String): DataFrame =
    Flatten.withDay(
        Tables.events(s, d).withColumn("day_str", date_format(col("ts"), "yyyy-MM-dd")),
        "day_str")
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"))

  /** §2.1#6+#8 — align to a warehouse schema: `quality_flag` is in the
    * schema but not the frame → NULL column (load.py:104-181). Since
    * round 15 the target schema is a FILE CONTRACT
    * (schemas/events_daily.json, the reference's own extension
    * mechanism — load.py:65-88 reads schemas/oura/<table>.json):
    * onboarding a table means dropping a JSON file, not editing Scala.
    * The contract resolves relative to the working directory like the
    * reference's bundle-relative path; a missing or malformed file
    * fails the query loudly. */
  def schemaAlign(s: SparkSession, d: String): DataFrame = {
    val target = SchemaAlign.fromJsonFile("schemas/events_daily.json")
    SchemaAlign.align(
        Tables.events(s, d).select(col("event_id"), day, col("value")),
        target)
      .orderBy(col("event_id"))
  }

  /** §2.1#7 — combined_daily (transform.py:130-153): one daily frame per
    * event type, full-outer merged on day into a wide table. */
  def combinedDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val types = Seq("click", "purchase", "error")
    val frames = types.map { t =>
      ev.filter(col("event_type") === t)
        .groupBy(day)
        .agg(count(lit(1)).as(s"${t}__n"),
             sum(dec2(col("value"))).cast(DoubleType).as(s"${t}__value"))
    }
    CombineDaily.combine(frames).orderBy(col("day"))
  }

  /** §2.1#9+#12 — landed-date inventory (load.py:209-224). */
  def existingDates(s: SparkSession, d: String): DataFrame =
    Incremental.existingDates(Tables.events(s, d), date_format(col("ts"), "yyyy-MM-dd"))
      .orderBy(col("day"))

  /** §2.1#10 — duplicate detection with provenance (load.py:277-302):
    * (user, type, day) groups with more than one record. */
  def overlapDetect(s: SparkSession, d: String): DataFrame =
    Overlap.duplicates(
        Tables.events(s, d).withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        Seq(col("user_id"), col("event_type"), col("day")), col("event_id"))
      .orderBy(col("user_id"), col("event_type"), col("day"))

  /** §2.1#11 — overlapping landed ranges (common_utils.py:60-75): per
    * user, the [min,max]-day span of each event type vs the others. */
  def rangeOverlap(s: SparkSession, d: String): DataFrame = {
    val ranges = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
    Overlap.rangeOverlaps(ranges, "user_id", "event_type", "d0", "d1")
      .select(col("user_id"), col("label_a").as("type_a"), col("label_b").as("type_b"),
        date_format(col("a_start"), "yyyy-MM-dd").as("a_start"),
        date_format(col("a_end"), "yyyy-MM-dd").as("a_end"),
        date_format(col("b_start"), "yyyy-MM-dd").as("b_start"),
        date_format(col("b_end"), "yyyy-MM-dd").as("b_end"))
      .orderBy(col("user_id"), col("type_a"), col("type_b"))
  }

  /** §2.1#14 — detail stream → daily metrics (the heartrate→daily
    * rollup the reference defers to BigQuery). */
  def dailyRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), day)
      .agg(count(lit(1)).as("n"),
           (sum(dec2(col("value"))).cast(DoubleType) / count(lit(1))).as("avg_value"),
           min(col("value")).as("min_value"),
           max(col("value")).as("max_value"))
      .orderBy(col("user_id"), col("day"))

  /** §2.1#15 — missing days per user between first and last activity. */
  def gapDays(s: SparkSession, d: String): DataFrame =
    GapFill.missingDays(
        Tables.events(s, d).withColumn("day", to_date(col("ts"))),
        Seq("user_id"), "day")
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"))
      .orderBy(col("user_id"), col("day"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incremental_watermark" -> (incrementalWatermark _),
    "q_chunked_ranges"        -> (chunkedRanges _),
    "q_flatten_json"          -> (flattenJson _),
    "q_day_parse"             -> (dayParse _),
    "q_schema_align"          -> (schemaAlign _),
    "q_combined_daily"        -> (combinedDaily _),
    "q_existing_dates"        -> (existingDates _),
    "q_overlap_detect"        -> (overlapDetect _),
    "q_range_overlap"         -> (rangeOverlap _),
    "q_daily_rollup"          -> (dailyRollup _),
    "q_gap_days"              -> (gapDays _),
  )

  val oracles: Map[String, String] = Map(
    "q_incremental_watermark" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events,
        |  (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS w
        |   FROM events WHERE ts < TIMESTAMP '2024-01-21') wm
        |WHERE CAST(date_trunc('day', ts) AS DATE) > wm.w
        |ORDER BY event_id""".stripMargin,

    "q_chunked_ranges" ->
      """SELECT
        |  CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) / 7.0) AS BIGINT) AS chunk,
        |  strftime(MIN(CAST(date_trunc('day', ts) AS DATE)), '%Y-%m-%d') AS chunk_start,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY 1
        |ORDER BY chunk""".stripMargin,

    "q_flatten_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props__k
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_day_parse" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,

    "q_schema_align" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS day, value,
        |  CAST(NULL AS VARCHAR) AS quality_flag
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_combined_daily" ->
      """WITH click AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS click__n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS click__value
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |purchase AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS purchase__n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS purchase__value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |error AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS error__n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS error__value
        |  FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT day, click__n, click__value, purchase__n, purchase__value, error__n, error__value
        |FROM click
        |FULL JOIN purchase USING (day)
        |FULL JOIN error USING (day)
        |ORDER BY day""".stripMargin,

    "q_existing_dates" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_records
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,

    "q_overlap_detect" ->
      """SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) AS n_dup, MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |FROM events
        |GROUP BY 1, 2, 3
        |HAVING COUNT(*) > 1
        |ORDER BY user_id, event_type, day""".stripMargin,

    "q_range_overlap" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
        |    MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
        |  FROM events GROUP BY 1, 2)
        |SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
        |  strftime(a.d0, '%Y-%m-%d') AS a_start, strftime(a.d1, '%Y-%m-%d') AS a_end,
        |  strftime(b.d0, '%Y-%m-%d') AS b_start, strftime(b.d1, '%Y-%m-%d') AS b_end
        |FROM r a JOIN r b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        | AND a.d0 <= b.d1 AND b.d0 <= a.d1
        |ORDER BY a.user_id, type_a, type_b""".stripMargin,

    "q_daily_rollup" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY user_id, day""".stripMargin,

    "q_gap_days" ->
      """WITH b AS (
        |  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
        |    MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |have AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events)
        |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day
        |FROM spine s LEFT JOIN have h ON s.user_id = h.user_id AND s.day = h.day
        |WHERE h.user_id IS NULL
        |ORDER BY s.user_id, s.day""".stripMargin,
  )
}
