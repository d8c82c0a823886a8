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

  // ---- real-socket seam: HttpPageFetcher vs a flaky loopback server --------
  // The JDK's com.sun.net.httpserver stands in for the reference API
  // (extract.py:24-48): bearer-auth GETs over real sockets, with the
  // fixture injecting 500s, rate limits, pagination cursors, and auth
  // checks. Everything below extract.py delegates to requests/Airflow
  // (connection handling, retry) runs for real here.

  /** Loopback fixture: scripted per-path failure budgets, request log,
    * bearer check, cursor pagination. */
  private class FlakyServer {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val requests = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val failuresLeft = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    val server: HttpServer = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    def failFirst(path: String, n: Int): Unit =
      failuresLeft.put(path, new java.util.concurrent.atomic.AtomicInteger(n))

    private def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b)
      x.close()
    }

    /** `pages(token)` = (body). Route every path through the script. */
    def handle(path: String)(pages: Map[String, String]): Unit =
      server.createContext(path, (x: HttpExchange) => {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        requests.add(s"$path?$q")
        if (Option(x.getRequestHeaders.getFirst("Authorization"))
            .forall(_ != "Bearer tok-123")) respond(x, 401, "no auth")
        else {
          val budget = failuresLeft.get(path)
          if (budget != null && budget.getAndDecrement() > 0)
            respond(x, if (budget.get() % 2 == 0) 500 else 429, "flaky")
          else {
            val tok = q.split("&").find(_.startsWith("next_token="))
              .map(_.drop("next_token=".length)).getOrElse("")
            respond(x, 200, pages.getOrElse(tok, """{"data":[]}"""))
          }
        }
      })

    server.start()
    def stop(): Unit = server.stop(0)
  }

  private def req(endpoint: String, pStart: String, pEnd: String) =
    ExtractClient.PageRequest("t", endpoint, 0, "2025-01-01", "2025-01-02",
      pStart, pEnd)

  test("http fetcher: retries 500/429 with doubling backoff, then succeeds") {
    val srv = new FlakyServer
    try {
      srv.handle("/flaky")(Map("" -> """{"data":[{"day":"2025-01-01","metric":"m","value":1.0}]}"""))
      srv.failFirst("/flaky", 2)
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 3, backoffMs = 10, sleeper = sleeps += _)
      val body = f.fetch(req("/flaky", "2025-01-01", "2025-01-03"))
      assert(body.contains("\"value\":1.0"))
      assert(sleeps.toSeq == Seq(10L, 20L)) // exact doubling schedule
      assert(srv.requests.size == 3)        // 2 failures + 1 success
    } finally srv.stop()
  }

  test("http fetcher: exhausting the retry budget throws with the attempt count") {
    val srv = new FlakyServer
    try {
      srv.handle("/down")(Map("" -> """{"data":[]}"""))
      srv.failFirst("/down", 99)
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 2, backoffMs = 1, sleeper = _ => ())
      val e = intercept[java.io.IOException] {
        f.fetch(req("/down", "2025-01-01", "2025-01-03"))
      }
      assert(e.getMessage.contains("after 3 attempts"))
      assert(srv.requests.size == 3)
    } finally srv.stop()
  }

  test("http fetcher: a 404 fails immediately — no retry on caller bugs") {
    val srv = new FlakyServer
    try {
      srv.handle("/ok")(Map("" -> """{"data":[]}"""))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 5, backoffMs = 1, sleeper = _ => fail("must not sleep"))
      intercept[graft.sources.HttpPageFetcher.ClientError] {
        f.fetch(req("/missing", "2025-01-01", "2025-01-03"))
      }
      // no handler path logged: the server's default 404 answered once
      // and the fetcher never slept (the sleeper would have failed)
      assert(srv.requests.isEmpty)
    } finally srv.stop()
  }

  test("http fetcher: follows next_token cursors and merges all pages' data") {
    val srv = new FlakyServer
    try {
      srv.handle("/paged")(Map(
        "" -> """{"data":[{"day":"2025-01-01","metric":"a","value":1.0}],"next_token":"p2"}""",
        "p2" -> """{"data":[{"day":"2025-01-02","metric":"b","value":2.0}],"next_token":"p3"}""",
        "p3" -> """{"data":[{"day":"2025-01-03","metric":"c","value":3.0}]}"""))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 0, backoffMs = 1, sleeper = _ => ())
      val body = f.fetch(req("/paged", "2025-01-01", "2025-01-04"))
      assert(Seq("\"metric\":\"a\"", "\"metric\":\"b\"", "\"metric\":\"c\"")
        .forall(body.contains))
      assert(srv.requests.size == 3)
      // param names: a date request sends start_date/end_date...
      assert(srv.requests.get(0).contains("start_date=2025-01-01"))
      // ...and cursor follow-ups re-send them plus the token
      assert(srv.requests.get(1).contains("next_token=p2"))
    } finally srv.stop()
  }

  test("http fetcher: a scalar data body sharing characters with the token cannot mangle the cursor") {
    // regression: the cursor used to be found via json.replace(body, ""),
    // which removes EVERY occurrence of the data-array text — for a
    // short scalar body like "1", the token "a1b" became "ab" and the
    // follow-up asked the server for a cursor that does not exist
    val srv = new FlakyServer
    try {
      srv.handle("/scalar")(Map(
        "" -> """{"data":[1],"next_token":"a1b"}""",
        "a1b" -> """{"data":[2]}"""))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 0, backoffMs = 1, sleeper = _ => ())
      val body = f.fetch(req("/scalar", "2025-01-01", "2025-01-02"))
      assert(body == """{"data":[1,2]}""")
      assert(srv.requests.size == 2)
      assert(srv.requests.get(1).contains("next_token=a1b"))
    } finally srv.stop()
  }

  test("http fetcher: a cursor containing escaped quotes round-trips intact") {
    val srv = new FlakyServer
    try {
      // token value is x"y — serialized with a JSON escape; the old
      // regex stopped at the escaped quote and sent a truncated token
      // the fixture reads HttpExchange.getRequestURI.getQuery, which
      // URL-decodes — so the lookup key is the decoded token x"y (the
      // fetcher must still SEND it percent-encoded to survive the URI)
      srv.handle("/esc")(Map(
        "" -> "{\"data\":[{\"v\":1}],\"next_token\":\"x\\\"y\"}",
        "x\"y" -> """{"data":[{"v":2}]}"""))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 0, backoffMs = 1, sleeper = _ => ())
      val body = f.fetch(req("/esc", "2025-01-01", "2025-01-02"))
      assert(body == """{"data":[{"v":1},{"v":2}]}""")
    } finally srv.stop()
  }

  test("http fetcher: a record field named next_token does not hijack the cursor") {
    val srv = new FlakyServer
    try {
      // the only next_token lives INSIDE the data array — positionally
      // excluded, so pagination must stop after one page
      srv.handle("/inner")(Map(
        "" -> """{"data":[{"next_token":"trap","v":1}]}"""))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 0, backoffMs = 1, sleeper = _ => ())
      val body = f.fetch(req("/inner", "2025-01-01", "2025-01-02"))
      assert(body == """{"data":[{"next_token":"trap","v":1}]}""")
      assert(srv.requests.size == 1)
    } finally srv.stop()
  }

  test("http fetcher: datetime requests send RFC-3339 start_datetime/end_datetime") {
    val srv = new FlakyServer
    try {
      srv.handle("/dt")(Map("" -> """{"data":[]}"""))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 0, backoffMs = 1, sleeper = _ => ())
      f.fetch(req("/dt", "2025-01-01T00:00:00Z", "2025-01-03T23:59:59Z"))
      val q = srv.requests.get(0) // getQuery logs DECODED params
      assert(q.contains("start_datetime=2025-01-01T00:00:00Z"), q)
      assert(q.contains("end_datetime=2025-01-03T23:59:59Z"), q)
    } finally srv.stop()
  }

  test("end-to-end over real sockets: flaky server, retry inside executor tasks, raw-zone resume") {
    val srv = new FlakyServer
    try {
      val mk = (day: String, v: Double) =>
        s"""{"day":"$day","metric":"hr","value":$v}"""
      srv.handle("/hr")(Map("" -> s"""{"data":[${mk("2025-06-09", 7.0)}]}"""))
      srv.failFirst("/hr", 2) // both fetch attempts of the first window flake
      val root = Files.createTempDirectory("graft_extract_http").toString
      val specs = Seq(EndpointSpec("heartrate", "/hr", DateParams))
      val f = new graft.sources.HttpPageFetcher(srv.base, "tok-123",
        maxRetries = 3, backoffMs = 5)
      val dirs = ExtractClient.extractToRaw(spark, specs, f, root,
        day("2025-06-10"), historicalDays = 5)
      assert(dirs.size == 1)
      val landed = spark.read.json(dirs.head) // the raw zone lands JSON
      assert(landed.count() == 1 &&
        landed.select("day").head().getString(0) == "2025-06-09")
      // watermark advanced: a second run plans (and requests) nothing
      val before = srv.requests.size
      assert(ExtractClient.extractToRaw(spark, specs, f, root,
        day("2025-06-10"), historicalDays = 5).isEmpty)
      assert(srv.requests.size == before)
    } finally srv.stop()
  }
}
