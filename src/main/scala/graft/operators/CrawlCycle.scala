package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** The crawl-cycle capstone (SURVEY.md §2 row 264) — ONE program
  * closing the whole crawl family from a single artifact, the way
  * the reference's DAG (oura_dag.py) closes extract→transform→load:
  *
  *   robots.txt → Sitemap: discovery (row 257) → sitemap bodies
  *   parsed (row 247) → wildcard permit verdicts (rows 241/261) →
  *   frontier state with lastmod change detection (row 262) →
  *   per-host politeness schedule under declared Crawl-delays
  *   (rows 252/257).
  *
  * Hosts rotate through the three seeded robots shapes: shape 0
  * declares ONE sitemap (all docs), shape 1 declares TWO (id-parity
  * split — multi-sitemap hosts), shape 2 declares NONE and is absent
  * from the cycle entirely — coverage is discovery-DRIVEN, exactly
  * the property a crawler needs.
  *
  * Scale shape: every stage is the already-audited operator — the
  * capstone adds only equi-joins between them (sitemap membership,
  * permit verdicts, the ledger, the delay map); the one per-host
  * rank window is the scheduler's, semantically serial per host. */
object CrawlCycle {

  def crawlCycleQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val host = concat(lit("www."), lower(col("source")), lit(".com"))

    // host shape = min doc id mod 3 (the seededRobots pick rule)
    val shape = docs.groupBy(host.as("host"))
      .agg((min(col("doc_id")) % 3).as("shape"))

    // the crawl-plan entry shape: robots-exercising paths, .tmp
    // variants, rotating lastmod and priority
    val pathPart = when(pmod(col("doc_id"), lit(4)) === 0, "/private/")
      .when(pmod(col("doc_id"), lit(4)) === 1, "/private/ok/")
      .when(pmod(col("doc_id"), lit(4)) === 2, "/tmp")
      .otherwise("/public/")
    val lastmod = when(pmod(col("doc_id"), lit(3)) === 0, lit(""))
      .otherwise(concat(lit("2025-01-"),
        lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0")))
    val prioVal = when(pmod(col("doc_id"), lit(18)) === 0, lit("1.0"))
      .when(pmod(col("doc_id"), lit(18)) === 6, lit("1"))
      .otherwise(concat(lit("0."), (pmod(col("doc_id"), lit(9)) + 1).cast("string")))
    val prio = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("<priority>"), prioVal, lit("</priority>"))).otherwise(lit(""))
    val entry = concat(lit("<url><loc>HTTPS://WWW."), upper(col("source")),
      lit(".COM:443"), pathPart, lit("page"),
      pmod(col("doc_id"), lit(7)).cast("string"),
      when(pmod(col("doc_id"), lit(5)) === 0, ".tmp").otherwise(""),
      lit("?utm_source=map</loc>"),
      when(lastmod =!= "", concat(lit("<lastmod>"), lastmod, lit("</lastmod>")))
        .otherwise(lit("")),
      prio, lit("</url>"))

    // sitemap membership by host shape: one urlset, a parity pair, or
    // none — the bodies exist ONLY for what robots declares
    val entryRows = docs
      .select(host.as("host"), col("doc_id"), entry.as("entry"),
        pmod(col("doc_id"), lit(2)).as("par"))
      .join(shape, Seq("host"))
      .withColumn("sm_url",
        when(col("shape") === 0,
          concat(lit("https://"), col("host"), lit("/sitemap.xml")))
        .when(col("shape") === 1,
          concat(lit("https://"), col("host"),
            when(col("par") === 0, "/a.xml").otherwise("/b.xml")))
        .otherwise(lit(null)))
      .filter(col("sm_url").isNotNull)
    val bodies = entryRows.groupBy(col("host"), col("sm_url"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("xml"))

    // 1. DISCOVERY: the robots artifact names the sitemaps to fetch.
    // (seededRobots persists internally — consumed by the sitemap-
    // declaration join, the rule parse, and the crawl-delay map.)
    val robots = Robots.seededRobots(docs)
    val declared = Robots.sitemapsDeclared(robots, "host", "txt")
    val fetchedMaps = declared
      .join(bodies, declared("sitemap_url") === bodies("sm_url") &&
        declared("host") === bodies("host"))
      .select(concat(declared("host"), lit("|"), col("sm_url")).as("ck"),
        col("xml"))

    // 2. PARSE each discovered sitemap (composite host|sm key).
    // PERSISTED (call-lifetime, the SURVEY §21 posture): sm feeds four
    // consumers across THREE actions (the permit verdicts, the two
    // ledger commits' url slices, and the frontier input) — unpinned,
    // the whole urlset-assembly + XML-regex parse chain re-executes
    // once per consumer. One row per sitemap entry, corpus-bounded.
    val sm = Robots.parseSitemap(fetchedMaps, "ck", "xml",
        recrawlAfter = "2025-01-15")
      .select(split(col("host"), "\\|").getItem(0).as("host"),
        split(col("host"), "\\|").getItem(1).as("sm_url"),
        col("pos"), col("loc_canon"), col("lastmod"), col("priority_ppm"))
      .withColumn("path",
        regexp_extract(col("loc_canon"), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. PERMIT: wildcard-aware verdicts for graftbot
    val verdicts = Robots.decide(sm.select(col("host"), col("path")).distinct(),
        Robots.parseRules(robots, "host", "txt"), "GraftBot")
      .select(col("host"), col("path"), col("allowed"))

    // 4. FRONTIER: a seeded two-delta fetch ledger keyed by the page
    //    number (deterministic in both engines); lastmod drives the
    //    changed verdict
    val root = java.nio.file.Files.createTempDirectory("graft_cycle_state").toString
    val k = regexp_extract(col("loc_canon"), "page([0-9])", 1).cast(LongType)
    val urls = sm.select(col("host"), col("loc_canon").as("url_canon"), k.as("k"))
      .distinct()
    CrawlState.commitFetched(s, urls.filter(col("k") <= 3)
      .select(col("url_canon"), col("host"), lit("2025-01-10").as("day")), root)
    CrawlState.commitFetched(s, urls.filter(col("k") === 4L || col("k") === 5L)
      .select(col("url_canon"), col("host"), lit("2025-01-20").as("day")), root)
    val front = CrawlState.frontier(s,
      sm.select(col("host"), col("loc_canon").as("url_canon"), col("sm_url"),
        col("pos"), col("priority_ppm"), col("lastmod"), col("path")),
      root, today = "2025-01-25", recrawlDays = 10)

    // 5. SCHEDULE: fetch = allowed AND due; per-host slots under the
    //    declared Crawl-delay; pos disambiguated across a host's two
    //    sitemaps (pos2 = pos*2 + b-child)
    val plan = front.join(verdicts, Seq("host", "path"))
      .withColumn("pos2", col("pos") * 2 +
        when(col("sm_url").endsWith("/b.xml"), 1L).otherwise(0L))
      .withColumn("fetch", col("allowed") && col("due"))
    val sched = Robots.schedulePlan(
        plan.select(col("host"), col("pos2").as("pos"),
          col("url_canon").as("loc_canon"), col("priority_ppm"), col("fetch")),
        qps = 4, Robots.crawlDelays(robots, "host", "txt", "GraftBot"))
      .select(col("host"), col("pos").as("pos2"), col("slot"),
        col("interval_us"), col("fetch_at_us"))
    plan.join(sched, Seq("host", "pos2"), "left")
      .select(col("host"), col("sm_url"), col("pos"),
        col("url_canon").as("loc_canon"), col("status"), col("allowed"),
        (col("allowed") && col("due")).as("fetch"),
        col("slot"), col("interval_us"), col("fetch_at_us"))
      .orderBy(col("host"), col("sm_url"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_crawl_cycle" -> (crawlCycleQ _))

  val oracles: Map[String, String] = Map(
    // the full replay from shared fragments: robots bodies + selection
    // (selx wildcards, cdsel delays, smf sitemaps), per-(host|sm)
    // urlset assembly gated on the DECLARED set, sitemapParseSql, the
    // verdict argmax, the inline ledger replay, and the per-host
    // schedule ranking
    "q_crawl_cycle" ->
      ("WITH " + Robots.robotsBodiesSql + ",\n"
        + Robots.robotsSelSql("graftbot") + """,
        |hostshape AS (
        |  SELECT 'www.' || lower(source) || '.com' AS h, MIN(doc_id) % 3 AS shape
        |  FROM documents GROUP BY 1),
        |e0 AS (
        |  SELECT doc_id, 'www.' || lower(source) || '.com' AS h,
        |    doc_id % 2 AS par,
        |    '<url><loc>HTTPS://WWW.' || upper(source) || '.COM:443'
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/private/'
        |             WHEN doc_id % 4 = 1 THEN '/private/ok/'
        |             WHEN doc_id % 4 = 2 THEN '/tmp'
        |             ELSE '/public/' END)
        |    || 'page' || CAST(doc_id % 7 AS VARCHAR)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '.tmp' ELSE '' END)
        |    || '?utm_source=map</loc>'
        |    || (CASE WHEN doc_id % 3 = 0 THEN ''
        |        ELSE '<lastmod>2025-01-'
        |          || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |          || '</lastmod>' END)
        |    || (CASE WHEN doc_id % 2 = 0 THEN
        |          '<priority>'
        |          || (CASE WHEN doc_id % 18 = 0 THEN '1.0'
        |              WHEN doc_id % 18 = 6 THEN '1'
        |              ELSE '0.' || CAST(doc_id % 9 + 1 AS VARCHAR) END)
        |          || '</priority>'
        |        ELSE '' END)
        |    || '</url>' AS entry
        |  FROM documents),
        |em AS (
        |  SELECT e0.*, hs.shape,
        |    CASE WHEN hs.shape = 0 THEN 'https://' || e0.h || '/sitemap.xml'
        |         WHEN hs.shape = 1 THEN 'https://' || e0.h
        |           || (CASE WHEN e0.par = 0 THEN '/a.xml' ELSE '/b.xml' END)
        |    END AS sm_url
        |  FROM e0 JOIN hostshape hs ON e0.h = hs.h
        |  WHERE hs.shape IN (0, 1)),
        |xml AS (
        |  SELECT em.h || '|' || em.sm_url AS host,
        |    '<urlset>' || string_agg(entry, '' ORDER BY doc_id)
        |      || '</urlset>' AS xml
        |  FROM em
        |  JOIN smf ON smf.host = em.h AND smf.sitemap_url = em.sm_url
        |  GROUP BY 1),
        |""".stripMargin
        + Robots.sitemapParseSql("2025-01-15") + """,
        |su AS (
        |  SELECT string_split(site, '|')[1] AS host,
        |    string_split(site, '|')[2] AS sm_url,
        |    pos, loc_canon, lastmod, priority_ppm,
        |    regexp_extract(loc_canon, '^[a-z][a-z0-9+.-]*://[^/]*(/.*)$', 1) AS path
        |  FROM smap),
        |m AS (
        |  SELECT u.host, u.path, s.allow,
        |    ROW_NUMBER() OVER (PARTITION BY u.host, u.path
        |      ORDER BY length(s.path) DESC,
        |        CASE WHEN s.allow THEN 1 ELSE 0 END DESC, s.path DESC) AS rn
        |  FROM (SELECT DISTINCT host, path FROM su) u
        |  LEFT JOIN selx s ON u.host = s.host
        |    AND regexp_matches(u.path, s.pat)),
        |v AS (SELECT host, path, COALESCE(allow, TRUE) AS allowed FROM m WHERE rn = 1),
        |led AS (
        |  SELECT DISTINCT loc_canon AS url_canon,
        |    CASE WHEN CAST(regexp_extract(loc_canon, 'page([0-9])', 1) AS BIGINT) <= 3
        |         THEN '2025-01-10'
        |         WHEN CAST(regexp_extract(loc_canon, 'page([0-9])', 1) AS BIGINT) IN (4, 5)
        |         THEN '2025-01-20' END AS last_fetch_day
        |  FROM su
        |  WHERE CAST(regexp_extract(loc_canon, 'page([0-9])', 1) AS BIGINT) <= 5),
        |fr AS (
        |  SELECT su.*, COALESCE(l.last_fetch_day, '') AS last_fetch_day,
        |    CASE WHEN l.last_fetch_day IS NULL THEN 'new'
        |         WHEN COALESCE(TRY_CAST(su.lastmod AS DATE)
        |              > TRY_CAST(l.last_fetch_day AS DATE), FALSE) THEN 'changed'
        |         WHEN TRY_CAST(l.last_fetch_day AS DATE) + INTERVAL 10 DAY
        |              <= DATE '2025-01-25' THEN 'recrawl'
        |         ELSE 'fresh' END AS status
        |  FROM su LEFT JOIN led l ON su.loc_canon = l.url_canon),
        |plan AS (
        |  SELECT fr.host, fr.sm_url, fr.pos, fr.loc_canon, fr.status,
        |    v.allowed, fr.priority_ppm,
        |    (v.allowed AND fr.status <> 'fresh') AS "fetch",
        |    fr.pos * 2 + (CASE WHEN fr.sm_url LIKE '%/b.xml' THEN 1 ELSE 0 END) AS pos2
        |  FROM fr JOIN v ON fr.host = v.host AND fr.path = v.path),
        |sched AS (
        |  SELECT host, pos2,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY host
        |      ORDER BY priority_ppm DESC, pos2) - 1 AS BIGINT) AS slot
        |  FROM plan WHERE "fetch")
        |SELECT p.host, p.sm_url, p.pos, p.loc_canon, p.status, p.allowed,
        |  p."fetch",
        |  s.slot,
        |  CASE WHEN s.slot IS NOT NULL
        |       THEN CAST(COALESCE(cd.crawl_delay_us, 250000) AS BIGINT) END
        |    AS interval_us,
        |  CAST(s.slot * COALESCE(cd.crawl_delay_us, 250000) AS BIGINT)
        |    AS fetch_at_us
        |FROM plan p
        |LEFT JOIN sched s ON p.host = s.host AND p.pos2 = s.pos2
        |LEFT JOIN cdsel cd ON p.host = cd.host
        |ORDER BY p.host, p.sm_url, p.pos""".stripMargin))
}
