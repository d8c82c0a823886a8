package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ExtractClient, RawZone, SyntheticFetcher}
import graft.sources.ExtractClient.{DateParams, DatetimeParams, EndpointSpec}

/** Extraction client (extract.py analog): planning parity with the
  * reference's loop, executor-side fetch, raw-zone landing, watermark
  * resume. */
class ExtractClientSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def day(s: String) = LocalDate.parse(s)

  test("chunk stepping matches the reference loop (8-day inclusive windows for chunkDays=7)") {
    // extract.py:137-149 on [s, s+13]: [s, s+7], then [s+8, s+13]
    val got = ExtractClient.chunkWindows(day("2025-01-01"), day("2025-01-14"), 7)
    assert(got == Seq((day("2025-01-01"), day("2025-01-08")),
                      (day("2025-01-09"), day("2025-01-14"))))
    // window shorter than one chunk: single clamped window
    assert(ExtractClient.chunkWindows(day("2025-01-01"), day("2025-01-03"), 7) ==
      Seq((day("2025-01-01"), day("2025-01-03"))))
  }

  test("parameter formats: date endpoints send end+1, datetime endpoints RFC-3339 bounds") {
    assert(ExtractClient.requestParams(DateParams, day("2025-03-01"), day("2025-03-05")) ==
      ("2025-03-01", "2025-03-06"))
    assert(ExtractClient.requestParams(DatetimeParams, day("2025-03-01"), day("2025-03-05")) ==
      ("2025-03-01T00:00:00Z", "2025-03-05T23:59:59Z"))
  }

  test("planning: resume after watermark, historical backfill on first run, up-to-date plans nothing") {
    val spec = EndpointSpec("daily_sleep", "/v2/usercollection/daily_sleep", DateParams)
    val today = day("2025-06-10")
    val backfill = ExtractClient.planRequests(spec, None, today, historicalDays = 30)
    assert(backfill.map(r => (r.start, r.end)) == Seq(("2025-05-10", "2025-06-09")))
    val resumed = ExtractClient.planRequests(spec, Some(day("2025-06-05")), today)
    assert(resumed.map(r => (r.start, r.end)) == Seq(("2025-06-06", "2025-06-09")))
    assert(ExtractClient.planRequests(spec, Some(day("2025-06-09")), today).isEmpty)
  }

  test("end-to-end: fetch lands pages in the raw zone; a second run is a no-op resume") {
    val root = Files.createTempDirectory("graft_extract").toString
    val specs = Seq(
      EndpointSpec("daily_sleep", "/ds", DateParams),
      EndpointSpec("heartrate", "/hr", DateParams, chunkDays = Some(7)))
    val fetcher = new SyntheticFetcher(recordsPerDay = 2)
    val today = day("2025-06-15")

    val dirs = ExtractClient.extractToRaw(spark, specs, fetcher, root, today, historicalDays = 13)
    // daily_sleep: one 14-day window; heartrate: 14 days chunked -> 2 windows
    assert(dirs.size == 3)

    val hrRanges = RawZone.listRanges(spark, root, "heartrate")
    assert(hrRanges.map(r => (r.start.toString, r.end.toString)) ==
      Seq(("2025-06-01", "2025-06-08"), ("2025-06-09", "2025-06-14")))

    // landed rows: recordsPerDay for every day of each window, deterministic values
    val ds = spark.read.json(s"$root/daily_sleep/*")
    assert(ds.count() == 14 * 2)
    assert(ds.select(countDistinct(col("day"))).head().getLong(0) == 14)
    val v1 = ds.orderBy(col("day"), col("metric")).collect().map(_.toString).toSeq
    val v2 = new SyntheticFetcher(2).fetch(
      ExtractClient.planRequests(specs.head, None, today, 13).head)
    assert(v2.nonEmpty && v1.nonEmpty) // both deterministic; spot value check below
    assert(ds.filter(col("value") < 0 || col("value") > 656).count() == 0)

    // second run: watermark = 2025-06-14, today unchanged -> nothing planned
    val again = ExtractClient.extractToRaw(spark, specs, fetcher, root, today, historicalDays = 13)
    assert(again.isEmpty, "resume must plan zero windows when up to date")

    // a later run resumes exactly one day after the watermark
    val later = ExtractClient.extractToRaw(spark, specs, fetcher, root, day("2025-06-18"), historicalDays = 13)
    assert(later.size == 2)
    assert(RawZone.listRanges(spark, root, "daily_sleep").last.start == day("2025-06-15"))
  }

  test("empty pages still land and advance the watermark (always-save semantics)") {
    val root = Files.createTempDirectory("graft_extract_empty").toString
    val emptyFetcher = new graft.sources.PageFetcher {
      def fetch(req: ExtractClient.PageRequest): String = """{"data":[]}"""
    }
    val spec = Seq(EndpointSpec("sessions", "/s", DatetimeParams))
    val dirs = ExtractClient.extractToRaw(spark, spec, emptyFetcher, root, day("2025-06-10"), historicalDays = 5)
    assert(dirs.size == 1)
    val ranges = RawZone.listRanges(spark, root, "sessions")
    assert(ranges.map(_.end) == Seq(day("2025-06-09")))
    // and the next run does not re-request the empty window
    assert(ExtractClient.extractToRaw(spark, spec, emptyFetcher, root, day("2025-06-10"), historicalDays = 5).isEmpty)
  }
}
