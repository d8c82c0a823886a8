package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** HTTP cache revalidation planning (SURVEY.md §2 row 286) — the
  * refetch economics of a recurring crawl: given each URL's last
  * fetch time and stored validators (Cache-Control, ETag,
  * Last-Modified), decide per URL whether the next cycle can SKIP
  * (still fresh), REVALIDATE cheaply (a conditional GET — 304 costs
  * headers, not the body), or must REFETCH. On a 100 TB recrawl the
  * difference between "GET everything" and "304 most of it" is most
  * of the bandwidth bill; this is the planner that realizes it,
  * sitting between row-263's frontier state and row-257's schedule.
  *
  * RFC 9111 subset, deterministic and SQL-replayable:
  *   - `no-store`  → refetch (the response was never cacheable);
  *   - freshness: age = now − fetched_at vs `max-age=N` when present,
  *     else the Last-Modified heuristic (fresh while age ≤
  *     (fetched_at − last_modified) / 10 — the RFC's suggested 10%);
  *     `no-cache` forbids serving fresh (always at least revalidate);
  *   - fresh → skip;
  *   - stale with an ETag → revalidate_etag (If-None-Match beats
  *     If-Modified-Since: exact, immune to clock skew);
  *   - stale with only Last-Modified → revalidate_lm;
  *   - no validator → refetch.
  *
  * Scale shape: a pure per-row projection — regexp extracts and
  * integer arithmetic over the frontier frame, ZERO shuffles before
  * the sink (the row-270 ttr posture). Directive parsing tolerates
  * list position and case; `s-maxage` never matches the `max-age`
  * extraction (different token). */
object HttpCache {

  private def hasDirective(cc: Column, d: String): Column =
    coalesce(cc, lit("")).rlike("(?i)(^|[,\\s])" + d + "($|[,\\s])")

  /** max-age seconds, NULL when absent. */
  def maxAge(cc: Column): Column = {
    val m = regexp_extract(coalesce(cc, lit("")),
      "(?i)(?:^|[,\\s])max-age=([0-9]+)", 1)
    when(m === "", lit(null)).otherwise(m.cast(LongType))
  }

  /** The plan frame: (url, age_sec, max_age, fresh, verdict). Inputs:
    * epoch-second columns (`nowSec` a literal epoch — the caller's
    * clock, never read here), nullable etag / lastModified /
    * cacheControl. */
  def revalidatePlan(frontier: DataFrame, urlCol: Column, fetchedAtCol: Column,
                     nowSec: Long, cacheControlCol: Column, etagCol: Column,
                     lastModifiedCol: Column): DataFrame = {
    val age = (lit(nowSec) - fetchedAtCol).cast(LongType)
    val ma = maxAge(cacheControlCol)
    val noStore = hasDirective(cacheControlCol, "no-store")
    val noCache = hasDirective(cacheControlCol, "no-cache")
    // heuristic lifetime only applies when max-age is absent AND a
    // Last-Modified exists; negative spans (clock skew) yield 0.
    // fdiv, not `/`: Column division is DOUBLE division in Spark
    val heur = GraphOps.fdiv(
      greatest((fetchedAtCol - lastModifiedCol).cast(LongType), lit(0L)), lit(10L))
    val fresh = !noCache && !noStore &&
      when(ma.isNotNull, age <= ma)
        .otherwise(lastModifiedCol.isNotNull && age <= heur)
    frontier.select(urlCol.as("url"), age.as("age_sec"), ma.as("max_age"),
        coalesce(fresh, lit(false)).as("fresh"),
        when(noStore, "refetch")
          .when(coalesce(fresh, lit(false)), "skip")
          .when(etagCol.isNotNull, "revalidate_etag")
          .when(lastModifiedCol.isNotNull, "revalidate_lm")
          .otherwise("refetch").as("verdict"))
  }

  /** §2 row 286 — the planner over a seeded frontier: per doc_id mod
    * cases, Cache-Control rotates through max-age (two horizons, one
    * of each fresh/stale at now), no-store, no-cache+max-age, s-maxage
    * only (must NOT parse as max-age), and absent; ETag present on
    * mod-2, Last-Modified on mod-3 — every verdict row is populated
    * and both freshness paths (max-age and the 10% heuristic) bite. */
  def revalidateQ(s: SparkSession, d: String): DataFrame = {
    val now = 1700010000L
    val m = pmod(col("doc_id"), lit(5))
    val seeded = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("https://www."), lower(col("source")), lit(".com/p/"),
        col("doc_id").cast("string")).as("url"),
      // fetched 1h + (doc_id mod 7) extra hours ago
      (lit(now) - 3600L - pmod(col("doc_id"), lit(7)) * 3600L).as("fetched_at"),
      when(m === 0, "max-age=86400")            // fresh for a day
        .when(m === 1, "public, max-age=3600")  // stale past an hour
        .when(m === 2, "no-store")
        .when(m === 3, "no-cache, max-age=86400") // never served fresh
        .otherwise("s-maxage=600")              // shared-cache only: no max-age
        .as("cache_control"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("\"etag-"), col("doc_id").cast("string"), lit("\"")))
        .as("etag"),
      // last modified 20h-to-70h before the fetch: the 10% heuristic
      // (2h..7h) straddles the 1h..7h ages -> both outcomes occur
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit(now) - 3600L - pmod(col("doc_id"), lit(7)) * 3600L
          - 72000L - pmod(col("doc_id"), lit(6)) * 30000L)
        .as("last_modified"))
    revalidatePlan(seeded, col("url"), col("fetched_at"), now,
        col("cache_control"), col("etag"), col("last_modified"))
      .orderBy(col("url"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_revalidate" -> (revalidateQ _))

  val oracles: Map[String, String] = Map(
    // the same directive regexes and integer freshness arithmetic;
    // DuckDB regexp_matches/regexp_extract take the same RE2-safe
    // patterns
    "q_revalidate" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    'https://www.' || lower(source) || '.com/p/' || CAST(doc_id AS VARCHAR) AS url,
        |    1700010000 - 3600 - (doc_id % 7) * 3600 AS fetched_at,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'max-age=86400'
        |      WHEN 1 THEN 'public, max-age=3600'
        |      WHEN 2 THEN 'no-store'
        |      WHEN 3 THEN 'no-cache, max-age=86400'
        |      ELSE 's-maxage=600' END AS cache_control,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '"etag-' || CAST(doc_id AS VARCHAR) || '"' END AS etag,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 1700010000 - 3600 - (doc_id % 7) * 3600
        |           - 72000 - (doc_id % 6) * 30000 END AS last_modified
        |  FROM documents),
        |p AS (
        |  SELECT url, fetched_at, etag, last_modified,
        |    CAST(1700010000 - fetched_at AS BIGINT) AS age_sec,
        |    CASE WHEN regexp_extract(cache_control,
        |        '(?i)(?:^|[,\s])max-age=([0-9]+)', 1) = '' THEN NULL
        |      ELSE CAST(regexp_extract(cache_control,
        |        '(?i)(?:^|[,\s])max-age=([0-9]+)', 1) AS BIGINT) END AS max_age,
        |    regexp_matches(cache_control, '(?i)(^|[,\s])no-store($|[,\s])') AS no_store,
        |    regexp_matches(cache_control, '(?i)(^|[,\s])no-cache($|[,\s])') AS no_cache,
        |    GREATEST(CAST(fetched_at - last_modified AS BIGINT), 0) // 10 AS heur
        |  FROM f),
        |v AS (
        |  SELECT url, age_sec, max_age,
        |    COALESCE(NOT no_cache AND NOT no_store AND
        |      CASE WHEN max_age IS NOT NULL THEN age_sec <= max_age
        |           ELSE last_modified IS NOT NULL AND age_sec <= heur END,
        |      FALSE) AS fresh,
        |    no_store, etag, last_modified
        |  FROM p)
        |SELECT url, age_sec, max_age, fresh,
        |  CASE WHEN no_store THEN 'refetch'
        |       WHEN fresh THEN 'skip'
        |       WHEN etag IS NOT NULL THEN 'revalidate_etag'
        |       WHEN last_modified IS NOT NULL THEN 'revalidate_lm'
        |       ELSE 'refetch' END AS verdict
        |FROM v
        |ORDER BY url""".stripMargin)
}
