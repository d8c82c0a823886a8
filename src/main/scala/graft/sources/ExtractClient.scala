package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTTP-extraction analog of the reference's REST client
  * (extract.py:24-149) — the one reference behavior the engine didn't
  * cover. The network call itself is pluggable ([[PageFetcher]]; the
  * sandbox has no egress, so tests run the deterministic
  * [[SyntheticFetcher]]); everything around it is real and verified:
  *
  * - parameter formatting — date endpoints send `start_date` /
  *   `end_date = end + 1 day` (extract.py:35-38); datetime endpoints
  *   send RFC-3339 `start_datetime = T00:00:00Z` /
  *   `end_datetime = T23:59:59Z` (extract.py:69-72,108-111)
  * - chunk stepping — `chunk_end = min(start + chunkDays, end)`, next
  *   window starts at `chunk_end + 1` (extract.py:137-149: 8-day
  *   inclusive windows for the 7-day heartrate chunk, NOT 7)
  * - resume — first window starts at max(landed)+1, or
  *   today-1-historicalDays on first run; start > end plans nothing
  *   (extract.py:170-186)
  * - landing — every planned window is written even when empty, so the
  *   watermark advances and the window is never re-requested
  *   (extract.py:188-193)
  *
  * Scale shape: planning is driver-side metadata (a few rows per data
  * type, like [[RawZone.listRanges]]); the fetches themselves run on
  * executors via a `Dataset[PageRequest]`, so a backfill of thousands
  * of chunk windows fans out across the cluster.
  */
object ExtractClient {

  sealed trait ParamKind
  case object DateParams extends ParamKind
  case object DatetimeParams extends ParamKind

  /** One configured endpoint (constants.py DATA_TYPES analog). */
  final case class EndpointSpec(dataType: String, endpoint: String,
                                kind: ParamKind, chunkDays: Option[Int] = None)

  /** One planned request: the inclusive day window plus the exact
    * query parameters the reference would send. */
  final case class PageRequest(dataType: String, endpoint: String, chunk: Int,
                               start: String, end: String,
                               pStart: String, pEnd: String)

  /** The reference's chunk loop: inclusive windows, `chunkDays`-day
    * stride then one day gap (so a 7-day chunk spans 8 days). One
    * implementation, shared with the batch DAG: [[RawZone.chunkWindow]]. */
  def chunkWindows(start: LocalDate, end: LocalDate, chunkDays: Int): Seq[(LocalDate, LocalDate)] =
    RawZone.chunkWindow(start, end, chunkDays)

  /** Query parameters for one window, per endpoint kind. */
  def requestParams(kind: ParamKind, start: LocalDate, end: LocalDate): (String, String) =
    kind match {
      case DateParams     => (start.toString, end.plusDays(1).toString)
      case DatetimeParams => (s"${start}T00:00:00Z", s"${end}T23:59:59Z")
    }

  /** Plan every request for one endpoint: resume after the watermark
    * ([[RawZone.resumeWindow]] — the shared contract), chunk if
    * configured, format parameters. Empty when already up to date. */
  def planRequests(spec: EndpointSpec, landedMax: Option[LocalDate],
                   today: LocalDate, historicalDays: Int = RawZone.HistoricalDays): Seq[PageRequest] =
    RawZone.resumeWindow(landedMax, today, historicalDays).toSeq.flatMap { case (start, end) =>
      val windows = spec.chunkDays match {
        case Some(c) => chunkWindows(start, end, c)
        case None => Seq((start, end))
      }
      windows.zipWithIndex.map { case ((s, e), i) =>
        val (ps, pe) = requestParams(spec.kind, s, e)
        PageRequest(spec.dataType, spec.endpoint, i, s.toString, e.toString, ps, pe)
      }
    }

  /** Page schema: `{"data": [{...}]}` (every reference endpoint wraps
    * its records in a `data` array). */
  private val pageSchema = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("day", StringType),
      StructField("metric", StringType),
      StructField("value", DoubleType)))))))

  /** Fetch every planned request and land each window in the raw zone
    * — always, even when the page is empty, so the watermark advances
    * (extract.py:188-193). Returns the landed dirs.
    *
    * Two phases so the slow part parallelizes: phase 1 is ONE
    * distributed job fetching ALL windows across ALL endpoints
    * (`Dataset[PageRequest]`, one fetch per task — a 1000-window
    * backfill runs 1000 HTTP calls concurrently; wall clock ~= the
    * slowest fetch, not the sum). Phase 2 parses and writes each
    * window's page from the cached fetch results — per-window jobs,
    * but over in-memory single rows, no network. The resume window
    * itself comes from [[RawZone.nextExtractionWindow]] — one
    * implementation of the watermark contract. */
  def extractToRaw(spark: SparkSession, specs: Seq[EndpointSpec], fetcher: PageFetcher,
                   root: String, today: LocalDate,
                   historicalDays: Int = RawZone.HistoricalDays): Seq[String] = {
    import spark.implicits._
    // each dataType owns root/<dataType>/<start>_<end> exclusively — two
    // specs sharing a dataType would race on the same landing dirs
    require(specs.map(_.dataType).distinct.size == specs.size,
      s"duplicate dataType in specs: ${specs.map(_.dataType).mkString(", ")}")
    val plans = specs.flatMap { spec =>
      planRequests(spec,
        RawZone.listRanges(spark, root, spec.dataType).lastOption.map(_.end),
        today, historicalDays)
    }
    if (plans.isEmpty) return Seq.empty
    // phase 1: ONE job, all fetches in parallel; results come back to
    // the driver keyed by the full request. Pages are API responses —
    // driver-memory-scale by the REST contract (the reference holds
    // them all in Python lists) — so collect() is the cheap, correct
    // move: phase 2 then schedules O(windows) single-task jobs instead
    // of O(windows^2) filter-scan tasks over a cached dataset.
    val pageByReq: Map[PageRequest, String] = spark.createDataset(plans)
      .repartition(plans.size)
      .map(req => (req, fetcher.fetch(req)))
      .collect().toMap
    // phase 2: parse + land each window from its own page
    plans.map { req =>
      val rows = spark.createDataset(Seq(pageByReq(req)))
        .select(from_json(col("value"), pageSchema).as("p"))
        .select(explode_outer(col("p.data")).as("r"))
        .select(col("r.day"), col("r.metric"), col("r.value"))
        .filter(col("day").isNotNull)
      RawZone.write(rows, root, req.dataType,
        LocalDate.parse(req.start), LocalDate.parse(req.end))
    }
  }

  /** §2.1 periphery — the deterministic request plan as a QUERY: three
    * endpoints planned off the events watermark (wm = max event day;
    * today = wm + 15, so the window is always the 14 days after wm).
    * Fully declarative — the watermark is a broadcast scalar, chunk
    * indices come from a `range` frame, parameters from date
    * arithmetic; no collect, so the same plan works when `events` is
    * 100 TB. */
  def extractPlanQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wm = Tables.events(s, d)
      .agg(max(to_date(col("ts"))).as("wm"))
      .select(col("wm"), date_add(col("wm"), 1).as("s"), date_add(col("wm"), 14).as("e"))
    val specs = Seq(
      ("daily_sleep", "date", 0),    // unchunked date endpoint
      ("heartrate", "date", 8),      // 7-day chunk = 8-day inclusive stride
      ("sessions", "datetime", 0))   // datetime endpoint
      .toDF("data_type", "kind", "stride")
    val chunks = s.range(0, 32).toDF("chunk")
    specs.crossJoin(broadcast(wm)).crossJoin(chunks)
      .withColumn("c_start",
        when(col("stride") === 0 && col("chunk") === 0, col("s"))
          .when(col("stride") > 0, date_add(col("s"), (col("chunk") * col("stride")).cast(IntegerType))))
      .filter(col("c_start").isNotNull && col("c_start") <= col("e"))
      .withColumn("c_end",
        when(col("stride") === 0, col("e"))
          .otherwise(least(date_add(col("c_start"), col("stride").cast(IntegerType) - 1), col("e"))))
      .withColumn("p_start",
        when(col("kind") === "date", col("c_start").cast(StringType))
          .otherwise(concat(col("c_start").cast(StringType), lit("T00:00:00Z"))))
      .withColumn("p_end",
        when(col("kind") === "date", date_add(col("c_end"), 1).cast(StringType))
          .otherwise(concat(col("c_end").cast(StringType), lit("T23:59:59Z"))))
      .select(col("data_type"), col("chunk"),
        col("c_start").cast(StringType).as("start_day"),
        col("c_end").cast(StringType).as("end_day"),
        col("p_start"), col("p_end"))
      .orderBy(col("data_type"), col("chunk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_extract_plan" -> (extractPlanQ _),
  )

  val oracles: Map[String, String] = Map(
    "q_extract_plan" ->
      """WITH wm AS (SELECT MAX(CAST(ts AS DATE)) AS w FROM events),
        |win AS (SELECT w + 1 AS s, w + 14 AS e FROM wm),
        |specs(data_type, kind, stride) AS (VALUES
        |  ('daily_sleep', 'date', 0), ('heartrate', 'date', 8), ('sessions', 'datetime', 0)),
        |idx AS (SELECT unnest(range(0, 32)) AS chunk),
        |plan AS (
        |  SELECT data_type, kind, stride, CAST(chunk AS BIGINT) AS chunk,
        |    CASE WHEN stride = 0 AND chunk = 0 THEN s
        |         WHEN stride > 0 THEN s + CAST(chunk * stride AS INTEGER) END AS c_start,
        |    e
        |  FROM specs, idx, win),
        |bounded AS (
        |  SELECT *,
        |    CASE WHEN stride = 0 THEN e
        |         ELSE least(c_start + (stride - 1), e) END AS c_end
        |  FROM plan WHERE c_start IS NOT NULL AND c_start <= e)
        |SELECT data_type, chunk,
        |  CAST(c_start AS VARCHAR) AS start_day,
        |  CAST(c_end AS VARCHAR) AS end_day,
        |  CASE WHEN kind = 'date' THEN CAST(c_start AS VARCHAR)
        |       ELSE CAST(c_start AS VARCHAR) || 'T00:00:00Z' END AS p_start,
        |  CASE WHEN kind = 'date' THEN CAST(c_end + 1 AS VARCHAR)
        |       ELSE CAST(c_end AS VARCHAR) || 'T23:59:59Z' END AS p_end
        |FROM bounded
        |ORDER BY data_type, chunk""".stripMargin,
  )
}

/** The pluggable network boundary: one JSON page body per request. A
  * production deployment implements this with an HTTP client + bearer
  * auth (extract.py:30,41); in this repo only [[SyntheticFetcher]]
  * exists, because the build environment has no network egress. */
trait PageFetcher extends Serializable {
  def fetch(req: ExtractClient.PageRequest): String
}

/** Deterministic stand-in for the HTTP call: synthesizes
  * `recordsPerDay` records for every day of the window, values a pure
  * function of (dataType, day, index) — so extraction tests are real
  * end-to-end (plan -> executor fetch -> JSON parse -> raw-zone land ->
  * watermark resume) minus only the socket. */
final class SyntheticFetcher(recordsPerDay: Int = 4) extends PageFetcher {
  def fetch(req: ExtractClient.PageRequest): String = {
    val start = LocalDate.parse(req.start)
    val days = java.time.temporal.ChronoUnit.DAYS.between(start, LocalDate.parse(req.end)) + 1
    val recs = for {
      d <- 0L until days
      i <- 0 until recordsPerDay
    } yield {
      val day = start.plusDays(d)
      val v = (graft.plans.PolyHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"${req.dataType}|$day|$i"))
        & 0xffffL).toDouble / 100.0
      s"""{"day":"$day","metric":"${req.dataType}_m$i","value":$v}"""
    }
    s"""{"data":[${recs.mkString(",")}]}"""
  }
}
