package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** Real-socket [[PageFetcher]] over the JDK's HttpURLConnection — the
  * production seam the reference fills with `requests.get`
  * (extract.py:24-48: bearer-auth GET, params, raise_for_status; the
  * retry layer lives in Airflow's `retries=1`, oura_dag.py:18). Here
  * the retry loop is IN the fetcher because executors, not an
  * orchestrator, run the fetches:
  *
  *  - **params**: `start_date`/`end_date` for date endpoints,
  *    `start_datetime`/`end_datetime` for datetime ones — which kind a
  *    request is rides on its formatted pStart (RFC-3339 values carry
  *    a 'T'; plain dates never do), so [[ExtractClient.PageRequest]]
  *    needs no extra field;
  *  - **retry/backoff**: connection errors, 429, and 5xx retry up to
  *    `maxRetries` times with doubling backoff (base `backoffMs`);
  *    4xx (≠429) is a caller bug and fails immediately, like
  *    raise_for_status. The sleeper is injectable so tests assert the
  *    exact backoff schedule instead of sleeping through it;
  *  - **pagination**: a page carrying a top-level `"next_token"`
  *    triggers a follow-up with `next_token=<tok>` appended (the Oura
  *    v2 cursor contract); the fetcher merges all pages' `data`
  *    arrays into one `{"data":[...]}` body so downstream parsing
  *    ([[ExtractClient.extractToRaw]]'s pageSchema) is page-count
  *    agnostic. Each pagination step gets its own retry budget.
  *
  * Scale: one fetcher instance is serialized per task; connections are
  * per-request (keep-alive is the JDK's affair); a 1000-window
  * backfill is 1000 independent tasks, each bounded by
  * maxRetries × backoff. */
final class HttpPageFetcher(baseUrl: String, token: String,
                            maxRetries: Int = 2, backoffMs: Long = 200L,
                            connectTimeoutMs: Int = 10000,
                            readTimeoutMs: Int = 30000,
                            sleeper: Long => Unit = Thread.sleep)
    extends PageFetcher {

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  private def paramNames(req: ExtractClient.PageRequest): (String, String) =
    if (req.pStart.contains("T")) ("start_datetime", "end_datetime")
    else ("start_date", "end_date")

  /** GET one URL with retry/backoff; returns the body. */
  private def getWithRetry(url: String): String = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      val outcome: Either[String, String] =
        try {
          val conn = new URI(url).toURL.openConnection()
            .asInstanceOf[HttpURLConnection]
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          conn.setRequestProperty("Authorization", s"Bearer $token")
          val code = conn.getResponseCode
          if (code / 100 == 2) {
            val in = conn.getInputStream
            try Right(new String(in.readAllBytes(), StandardCharsets.UTF_8))
            finally in.close()
          } else {
            Option(conn.getErrorStream).foreach(_.close())
            if (code == 429 || code / 100 == 5) Left(s"HTTP $code")
            else throw new HttpPageFetcher.ClientError(s"HTTP $code from $url")
          }
        } catch {
          case e: HttpPageFetcher.ClientError => throw e
          case e: IOException => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      outcome match {
        case Right(body) => return body
        case Left(why) =>
          attempt += 1
          if (attempt > maxRetries)
            throw new IOException(s"$url failed after $attempt attempts: $why")
          sleeper(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def fetch(req: ExtractClient.PageRequest): String = {
    val (pn, pe) = paramNames(req)
    val base = s"$baseUrl${req.endpoint}?$pn=${enc(req.pStart)}&$pe=${enc(req.pEnd)}"
    val chunks = Vector.newBuilder[String]
    var token = Option.empty[String]
    var pages = 0
    var done = false
    while (!done) {
      val url = token.fold(base)(t => s"$base&next_token=${enc(t)}")
      val body = getWithRetry(url)
      chunks += HttpPageFetcher.dataArrayBody(body)
      token = HttpPageFetcher.nextToken(body)
      pages += 1
      require(pages <= HttpPageFetcher.MaxPages,
        s"pagination exceeded ${HttpPageFetcher.MaxPages} pages for $base - " +
        "a cycling next_token would loop forever")
      done = token.isEmpty
    }
    s"""{"data":[${chunks.result().filter(_.nonEmpty).mkString(",")}]}"""
  }
}

object HttpPageFetcher {
  /** A 4xx (≠429): the request itself is wrong — retrying cannot help,
    * fail the task immediately (raise_for_status's posture). */
  final class ClientError(msg: String) extends IOException(msg)

  /** Hard cap on cursor follow-ups per window (loop/poison guard). */
  val MaxPages = 10000

  /** The [start, end) CONTENT span of the top-level `"data"` array
    * (exclusive of its brackets), found by quote-aware bracket
    * matching — record bodies may contain `[`/`]`/escapes inside
    * strings, so a regex won't do. Returned as a span (not the
    * substring) so [[nextToken]] can reason about POSITIONS: a
    * substring-removal approach (`json.replace(body, "")`) deletes
    * every occurrence of the body text, which for short scalar bodies
    * like `1` mangles unrelated characters — including the token
    * value itself. */
  private[sources] def dataArraySpan(json: String): (Int, Int) = {
    val key = "\"data\""
    var i = json.indexOf(key)
    require(i >= 0, s"page has no top-level data array: ${json.take(120)}")
    i += key.length
    while (i < json.length && (json(i) == ':' || json(i).isWhitespace)) i += 1
    require(i < json.length && json(i) == '[',
      s"data is not an array: ${json.take(120)}")
    val start = i + 1
    var depth = 1
    var inStr = false
    var j = start
    while (j < json.length && depth > 0) {
      val c = json(j)
      if (inStr) {
        if (c == '\\') j += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' => depth += 1
        case ']' => depth -= 1
        case _ => ()
      }
      j += 1
    }
    require(depth == 0, "unterminated data array")
    (start, j - 1)
  }

  private[sources] def dataArrayBody(json: String): String = {
    val (s, e) = dataArraySpan(json)
    json.substring(s, e).trim
  }

  /** Top-level `"next_token": "<tok>"`, if present and non-null. Only
    * key occurrences whose POSITION lies outside the data array's span
    * count, so a record field named next_token cannot hijack the
    * cursor. The value is parsed as a real JSON string (escape-aware)
    * rather than regexed — a cursor containing `\"` must round-trip
    * intact or the follow-up URL asks for a truncated token. */
  private[sources] def nextToken(json: String): Option[String] = {
    val (s, e) = dataArraySpan(json)
    val key = "\"next_token\""
    var i = json.indexOf(key)
    while (i >= 0) {
      if (i < s || i >= e) {
        var j = i + key.length
        while (j < json.length && (json(j) == ':' || json(j).isWhitespace)) j += 1
        if (j < json.length && json(j) == '"') {
          val sb = new StringBuilder
          j += 1
          while (j < json.length && json(j) != '"') {
            if (json(j) == '\\' && j + 1 < json.length) {
              json(j + 1) match {
                case 'n' => sb.append('\n'); j += 2
                case 't' => sb.append('\t'); j += 2
                case 'r' => sb.append('\r'); j += 2
                case 'b' => sb.append('\b'); j += 2
                case 'f' => sb.append('\f'); j += 2
                case 'u' if j + 5 < json.length =>
                  sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
                  j += 6
                case c => sb.append(c); j += 2 // \" \\ \/ and friends
              }
            } else { sb.append(json(j)); j += 1 }
          }
          if (sb.nonEmpty) return Some(sb.toString)
        }
      }
      i = json.indexOf(key, i + 1)
    }
    None
  }
}
