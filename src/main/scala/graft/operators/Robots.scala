package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** robots.txt politeness engine (SURVEY.md §2 row 241) — the crawl-
  * side gate the reference's extract client (extract.py) would sit
  * behind in production: parse per-host robots.txt into agent groups,
  * select the group for a crawler name, and decide each URL by the
  * longest-path-match rule with Allow winning length ties (the
  * Google/RFC 9309 precedence), with the RFC's path wildcards: `*`
  * matches any char run and a trailing `$` anchors the end.
  * Deterministic subset, documented: agent matching is
  * exact-name-or-`*` (no prefix tokens).
  *
  * Scale shape: parsing is posexplode + one per-host line window
  * (robots files are KB-bounded — the window frame is the FILE, never
  * a corpus); the decision is one equi-join of URLs against the
  * selected rule set on host plus an argmax over the matching rules
  * via max(struct(len, allow, …)) — map-side combined, no window over
  * URL rows, no driver state. */
object Robots {

  /** (host, pos, field, value) for every `Field: value` line,
    * comments stripped — the shared front of rule parsing, crawl-
    * delay extraction and sitemap discovery. */
  private def fieldLines(robots: DataFrame, hostCol: String, txtCol: String): DataFrame =
    robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .withColumn("field", lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value", trim(regexp_replace(col("line"), "^[A-Za-z-]+\\s*:", "")))

  /** Group-scoped directive lines with group ids + per-group UA sets.
    * Group = a run of User-agent lines followed by its directives; a
    * UA line whose PREVIOUS group-scoped line was not a UA line
    * starts a new group. Crawl-delay is GROUP-scoped (it ends a UA
    * run, like allow/disallow); Sitemap is HOST-wide and transparent
    * to grouping; unknown fields are ignored (per spec). */
  private def grouped(robots: DataFrame, hostCol: String,
                      txtCol: String): (DataFrame, DataFrame) = {
    val lines = fieldLines(robots, hostCol, txtCol)
      .filter(col("field").isin("user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy(col("host")).orderBy(col("pos"))
    val g = lines
      .withColumn("prevField", lag(col("field"), 1).over(w))
      .withColumn("newGrp",
        when(col("field") === "user-agent" &&
          (col("prevField").isNull || col("prevField") =!= "user-agent"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("newGrp")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val uas = g.filter(col("field") === "user-agent")
      .groupBy(col("host"), col("grp"))
      .agg(collect_set(lower(col("value"))).as("ua_set"))
    // both persisted (host-bounded, KB-scale): parseRules and
    // crawlDelays each call grouped() and each consumes g AND uas —
    // unpinned, a schedule-class query replays the line-explode +
    // group-window chain four times (identical plans cache-match
    // across the separate calls, the seededRobots posture)
    (g.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      uas.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Parse robots bodies into (host, grp, ua_set, allow, path) rules. */
  def parseRules(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val (g, uas) = grouped(robots, hostCol, txtCol)
    g.filter(col("field").isin("allow", "disallow"))
      .join(uas, Seq("host", "grp"))
      .select(col("host"), col("grp"), col("ua_set"),
        (col("field") === "allow").as("allow"), col("value").as("path"))
  }

  /** Exact (integer + first-6-fraction-digits) millionths of a
    * decimal-string column — shared by the sitemap priority (ppm) and
    * Crawl-delay (micros) parses so the two cannot drift; the "0"
    * concat keeps the cast total when the integer part is absent. */
  private def millionthsOf(v: Column): Column =
    concat(lit("0"), regexp_extract(v, "^([0-9]+)", 1))
      .cast(LongType) * 1000000L +
    rpad(regexp_extract(v, "\\.([0-9]+)", 1), 6, "0")
      .substr(1, 6).cast(LongType)

  /** Per-host Crawl-delay selected for `agent` under RFC 9309 group
    * selection: the SELECTED groups govern ENTIRELY — if the host has
    * any exact-match group for the agent, only those groups' delays
    * count, even when they declare none and a `*` group does (an
    * exact group without a delay means NO delay, not the star
    * group's). (host, crawl_delay_us) for hosts whose selected groups
    * declare one. Fractional seconds parse exactly (integer part +
    * first 6 fraction digits — the priority-ppm pattern); non-numeric
    * values are ignored; multiple delays in the selected groups take
    * the MAX (the politer bound). */
  def crawlDelays(robots: DataFrame, hostCol: String, txtCol: String,
                  agent: String): DataFrame = {
    val a = agent.toLowerCase
    val (g, uas) = grouped(robots, hostCol, txtCol)
    // group selection is decided by the GROUPS, not by which of them
    // happen to declare a delay — deciding on delay-bearing rows only
    // would hand an exact-matched agent the star group's delay
    // whenever its own group omits one
    val hostHasExact = uas
      .groupBy(col("host"))
      .agg(max(when(array_contains(col("ua_set"), a), 1L).otherwise(0L))
        .as("has_exact"))
    g.filter(col("field") === "crawl-delay" &&
        col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .join(uas, Seq("host", "grp"))
      .withColumn("exact", array_contains(col("ua_set"), a))
      .withColumn("star", array_contains(col("ua_set"), "*"))
      .join(hostHasExact, Seq("host"))
      .filter((col("has_exact") === 1L && col("exact")) ||
        (col("has_exact") === 0L && col("star")))
      .withColumn("delay_us", millionthsOf(col("value")))
      .groupBy(col("host"))
      .agg(max(col("delay_us")).as("crawl_delay_us"))
  }

  /** Host-wide `Sitemap:` directives in declaration order —
    * (host, sm_pos, sitemap_url): the discovery hand-off from the
    * permission artifact to the row-247 sitemap stage. */
  def sitemapsDeclared(robots: DataFrame, hostCol: String,
                       txtCol: String): DataFrame =
    fieldLines(robots, hostCol, txtCol)
      .filter(col("field") === "sitemap" && col("value") =!= "")
      .select(col("host"), col("pos").cast(LongType).as("sm_pos"),
        col("value").as("sitemap_url"))

  /** Rules applying to `agent`: exact-name groups if any exist for
    * the host, else the `*` groups. An empty-path Disallow means
    * "allow all" and is dropped (it can never match more specifically
    * than any real rule; no rules → allowed by default anyway).
    * DOCUMENTED SUBSET: selection here is decided over rule-BEARING
    * groups — an exact group with zero allow/disallow lines does not
    * shadow `*` (under a strict RFC 9309 reading it would, meaning
    * allow-everything); [[crawlDelays]] already selects over ALL
    * groups because delays made the divergence observable there. */
  def rulesFor(rules: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    val tagged = rules
      .withColumn("exact", array_contains(col("ua_set"), a))
      .withColumn("star", array_contains(col("ua_set"), "*"))
      .filter(col("exact") || col("star"))
    val hostHasExact = tagged.groupBy(col("host"))
      .agg(max(when(col("exact"), 1L).otherwise(0L)).as("has_exact"))
    tagged.join(hostHasExact, Seq("host"))
      .filter((col("has_exact") === 1L && col("exact")) ||
        (col("has_exact") === 0L && col("star")))
      .filter(col("path") =!= "")
      .select(col("host"), col("allow"), col("path"))
  }

  /** Compile a robots rule path into its RFC 9309 match regex:
    * `*` matches any char run, a TRAILING `$` anchors the end, every
    * other char is literal (regex metachars escaped — an INNER `$` is
    * a literal). Shared by [[decide]]; the SQL twin lives in
    * [[robotsSelSql]]'s `selx` CTE. */
  private def rulePattern(rpath: Column): Column = {
    val anchored = rpath.endsWith("$")
    val body = when(anchored, rpath.substr(lit(1), length(rpath) - 1))
      .otherwise(rpath)
    // literal replace chain (backslash FIRST), mirrored verbatim in
    // the SQL selx CTE — a regex-based escape would need a second
    // layer of escaping in each engine's string dialect
    val esc = Seq("\\", ".", "^", "$", "+", "?", "(", ")", "[", "]", "{", "}", "|")
      .foldLeft(body)((c, ch) => replace(c, lit(ch), lit("\\" + ch)))
    concat(lit("^"), replace(esc, lit("*"), lit(".*")),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Per-URL verdict under `agent`: longest matching rule path wins
    * (specificity = the RULE's literal length, wildcards included —
    * the Google/RFC tiebreak), Allow wins exact length ties; no
    * matching rule (or no rules for the host) → allowed. Rule paths
    * support the RFC 9309 wildcards: `*` (any run) and a trailing
    * `$` (end anchor); the per-candidate regex is compiled from a
    * COLUMN (robots rules are KB-bounded per host, so the
    * non-foldable pattern rides a rule-bounded frame, never the
    * corpus). Output: (host, path, allowed, rule_path). */
  def decide(urls: DataFrame, rules: DataFrame, agent: String): DataFrame = {
    val rs = rulesFor(rules, agent)
    // left join keeps every URL; non-matching rules become NULL
    // candidates (not filtered rows) so a rule-bearing host's
    // unmatched URLs still default to allowed
    val matches = urls.select(col("host"), col("path"))
      .join(rs.withColumnRenamed("path", "rpath"), Seq("host"), "left")
      .groupBy(col("host"), col("path"))
      .agg(max(when(
        col("rpath").isNotNull &&
          regexp_like(col("path"), rulePattern(col("rpath"))),
        struct(length(col("rpath")).as("l"), col("allow").as("a"),
          col("rpath").as("p")))).as("m"))
    matches.select(col("host"), col("path"),
      coalesce(col("m.a"), lit(true)).as("allowed"),
      col("m.p").as("rule_path"))
  }

  /** The seeded per-host robots bodies shared by q_robots, q_crawl_plan
    * and q_crawl_schedule (one body per host, from the doc with the
    * minimal id — deterministic pick, replayed in SQL). Three shapes:
    * a `*`-only policy with a fractional Crawl-delay and one Sitemap,
    * a graftbot group (which must SHADOW the `*` group, delay
    * included: 1 s vs the star group's 10 s) with two Sitemaps, and a
    * comment-only file (no delay, no sitemap — the defaults case). */
  private[operators] def seededRobots(docs: DataFrame): DataFrame = {
    val host = concat(lit("www."), lower(col("source")), lit(".com"))
    val robotsTxt =
      when(pmod(col("doc_id"), lit(3)) === 0, concat(lit(
        "# star only\nUser-agent: *\nCrawl-delay: 2.5\nDisallow: /private/\nAllow: /private/ok/\nDisallow: /tmp\nDisallow: /*.tmp$\nSitemap: https://"),
        host, lit("/sitemap.xml")))
      .when(pmod(col("doc_id"), lit(3)) === 1, concat(lit(
        "User-agent: *\nCrawl-delay: 10\nDisallow: /\nUser-agent: graftbot\nUser-agent: otherbot\nCrawl-delay: 1\nDisallow: /private/\nAllow: /private/ok/\nDisallow: /*.tmp$\nSitemap: https://"),
        host, lit("/a.xml\nSitemap: https://"), host, lit("/b.xml")))
      .otherwise(lit("# no rules here\n# just comments"))
    // persisted at the source: most robots consumers derive 2-3 views
    // of this frame in one query (rule parse, crawl delays, sitemap
    // declarations), often through separate seededRobots calls whose
    // identical plans cache-match — host-bounded, and safe to key on
    // the plan because the docs input is immutable within a query
    docs.select(host.as("host"), col("doc_id"), robotsTxt.as("txt"))
      .groupBy(col("host")).agg(min(struct(col("doc_id"), col("txt"))).as("m"))
      .select(col("host"), col("m.txt").as("txt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** §2 row 241 — per-host robots bodies with agent groups seeded
    * from the documents table in both engines, decisions for the
    * `graftbot` agent over seeded URL paths, plus the host-level
    * directives: the selected Crawl-delay (micros; NULL where
    * undeclared) and the first declared Sitemap ('' where none). */
  def robotsQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val host = concat(lit("www."), lower(col("source")), lit(".com"))
    val robots = seededRobots(docs)
    val urls = docs.select(host.as("host"),
      concat(
        when(pmod(col("doc_id"), lit(4)) === 0, "/private/")
          .when(pmod(col("doc_id"), lit(4)) === 1, "/private/ok/")
          .when(pmod(col("doc_id"), lit(4)) === 2, "/tmp")
          .otherwise("/public/"),
        lit("page"), pmod(col("doc_id"), lit(7)).cast("string"),
        when(pmod(col("doc_id"), lit(5)) === 0, ".tmp").otherwise("")).as("path"))
      .distinct()
    val firstSitemap = sitemapsDeclared(robots, "host", "txt")
      .groupBy(col("host"))
      .agg(min(struct(col("sm_pos"), col("sitemap_url"))).as("sm"))
      .select(col("host"), col("sm.sitemap_url").as("sitemap_url"))
    decide(urls, parseRules(robots, "host", "txt"), "GraftBot")
      .join(crawlDelays(robots, "host", "txt", "GraftBot"), Seq("host"), "left")
      .join(firstSitemap, Seq("host"), "left")
      .select(col("host"), col("path"), col("allowed"), col("rule_path"),
        col("crawl_delay_us"),
        coalesce(col("sitemap_url"), lit("")).as("sitemap_url"))
      .orderBy(col("host"), col("path"))
  }

  // ---- sitemap discovery (row 247) ----

  /** Sitemap parsing + recrawl selection (SURVEY.md §2 row 247) —
    * robots' DISCOVERY companion: `<url>` entries pulled from a
    * sitemap body (loc required; lastmod/priority optional), loc
    * canonicalized via row 232, priority carried as exact ppm
    * (priority="0.8" → 800000 — no doubles on the wire), and the
    * recrawl verdict lastmod > cutoff that an incremental fetcher
    * acts on (the row-2 watermark idea applied to the crawl
    * frontier). Per-row projection + one posexplode; order within a
    * sitemap is document order. */
  def parseSitemap(maps: DataFrame, hostCol: String, xmlCol: String,
                   recrawlAfter: String): DataFrame = {
    val entryPat = "(?is)<url>(.*?)</url>"
    val entries = maps
      .select(col(hostCol).as("host"),
        posexplode(regexp_extract_all(col(xmlCol), lit(entryPat), lit(1)))
          .as(Seq("pos", "e")))
    entries.select(col("host"), col("pos").cast(LongType).as("pos"),
        regexp_extract(col("e"), "(?is)<loc>(.*?)</loc>", 1).as("loc"),
        regexp_extract(col("e"), "(?is)<lastmod>(.*?)</lastmod>", 1).as("lastmod"),
        regexp_extract(col("e"), "(?is)<priority>\\s*([0-9]*\\.?[0-9]*)\\s*</priority>", 1).as("p"))
      .filter(col("loc") =!= "")
      .select(col("host"), col("pos"), col("loc"),
        Urls.canonicalUrl(col("loc")).as("loc_canon"),
        col("lastmod"),
        // integer part (the spec's valid max "1" / "1.0" → 1000000 —
        // a fraction-only pattern would silently default it to
        // 500000) + the first 6 fraction digits zero-padded; the "0"
        // concat keeps the cast total when the integer part is absent
        when(col("p") =!= "", millionthsOf(col("p")))
          .otherwise(lit(500000L)).as("priority_ppm"),
        (col("lastmod") =!= "" && col("lastmod") > recrawlAfter).as("recrawl"))
  }

  /** §2 row 247 — one synthetic sitemap per host assembled by
    * aggregation from the documents on that host (ordered string_agg
    * == sorted-collect join — pinned by the round trip), then parsed
    * back: loc with tracking params to canonicalize, rotating lastmod
    * dates around the recrawl cutoff, priority present on every 2nd
    * entry. */
  def sitemapQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val host = concat(lit("www."), lower(col("source")), lit(".com"))
    val lastmod = when(pmod(col("doc_id"), lit(3)) === 0, lit(""))
      .otherwise(concat(lit("2025-01-"),
        lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0")))
    val prioVal = when(pmod(col("doc_id"), lit(18)) === 0, lit("1.0"))
      .when(pmod(col("doc_id"), lit(18)) === 6, lit("1"))
      .otherwise(concat(lit("0."), (pmod(col("doc_id"), lit(9)) + 1).cast("string")))
    val prio = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("<priority>"), prioVal, lit("</priority>"))).otherwise(lit(""))
    val entry = concat(lit("<url><loc>HTTPS://WWW."), upper(col("source")),
      lit(".COM:443/p/"), col("doc_id").cast("string"),
      lit("?utm_source=map&v=1</loc>"),
      when(lastmod =!= "", concat(lit("<lastmod>"), lastmod, lit("</lastmod>")))
        .otherwise(lit("")),
      prio, lit("</url>"))
    val maps = docs.select(host.as("host"), col("doc_id"), entry.as("entry"))
      .groupBy(col("host"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("xml"))
    parseSitemap(maps, "host", "xml", recrawlAfter = "2025-01-15")
      .orderBy(col("host"), col("pos"))
  }

  // ---- sitemap INDEX files (row 260) ----

  /** Sitemap index parsing (SURVEY.md §2 row 260) — the one level of
    * recursion the sitemap protocol defines: big sites ship a
    * `<sitemapindex>` of child `<sitemap><loc>` entries (each child a
    * plain urlset), so discovery is index → children → row-247 parse.
    * Same shape discipline as [[parseSitemap]]: pure projection + one
    * posexplode, loc required, lastmod optional, document order. */
  def parseSitemapIndex(maps: DataFrame, hostCol: String,
                        xmlCol: String): DataFrame = {
    val entryPat = "(?is)<sitemap>(.*?)</sitemap>"
    maps.select(col(hostCol).as("host"),
        posexplode(regexp_extract_all(col(xmlCol), lit(entryPat), lit(1)))
          .as(Seq("pos", "e")))
      .select(col("host"), col("pos").cast(LongType).as("idx_pos"),
        regexp_extract(col("e"), "(?is)<loc>(.*?)</loc>", 1).as("child_loc"),
        regexp_extract(col("e"), "(?is)<lastmod>(.*?)</lastmod>", 1)
          .as("idx_lastmod"))
      .filter(col("child_loc") =!= "")
  }

  /** §2 row 260 — index → children → urls, end to end: per host a
    * seeded index of two child sitemaps (docs split by id parity),
    * child bodies fetched by (host, child_loc) equi-join, each child
    * urlset through the row-247 parser keyed by the composite
    * `host|child_loc` (split back after). */
  def sitemapIndexQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val host = concat(lit("www."), lower(col("source")), lit(".com"))
    val g = pmod(col("doc_id"), lit(2))
    val childLoc = concat(lit("https://"), host, lit("/sm/"),
      g.cast("string"), lit(".xml"))
    // the index: one <sitemap> entry per DISTINCT child on the host
    val idxXml = docs
      .select(host.as("host"), childLoc.as("child_loc"), g.as("g"))
      .distinct()
      .groupBy(col("host"))
      .agg(concat(lit("<sitemapindex>"),
        array_join(transform(sort_array(collect_list(
            struct(col("g"), col("child_loc")))),
          x => concat(lit("<sitemap><loc>"), x.getField("child_loc"),
            lit("</loc><lastmod>2025-01-10</lastmod></sitemap>"))), ""),
        lit("</sitemapindex>")).as("xml"))
    // child bodies: the docs of that parity on that host
    val entry = concat(lit("<url><loc>HTTPS://WWW."), upper(col("source")),
      lit(".COM:443/p/"), col("doc_id").cast("string"),
      lit("?utm_source=map</loc>"),
      when(pmod(col("doc_id"), lit(3)) =!= 0,
        concat(lit("<lastmod>2025-01-"),
          lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
          lit("</lastmod>"))).otherwise(lit("")),
      lit("</url>"))
    val bodies = docs
      .select(host.as("host"), childLoc.as("child_loc"), col("doc_id"),
        entry.as("entry"))
      .groupBy(col("host"), col("child_loc"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("xml"))
    val idx = parseSitemapIndex(idxXml, "host", "xml")
    val fetched = idx.join(bodies, Seq("host", "child_loc"))
      .select(concat(col("host"), lit("|"), col("child_loc")).as("ck"),
        col("idx_pos"), col("xml"))
    parseSitemap(fetched, "ck", "xml", recrawlAfter = "2025-01-15")
      // parseSitemap names its key 'host' = our composite ck
      .select(split(col("host"), "\\|").getItem(0).as("host"),
        split(col("host"), "\\|").getItem(1).as("child_loc"),
        col("pos"), col("loc_canon"), col("lastmod"), col("recrawl"))
      .orderBy(col("host"), col("child_loc"), col("pos"))
  }

  /** §2 row 249 — the crawl capstone: sitemap discovery (247)
    * through the robots gate (241): per discovered URL the canonical
    * loc, its robots verdict for `graftbot`, the recrawl flag, and
    * fetch = allowed ∧ due. The frontier a polite incremental fetcher
    * executes. */
  private def crawlPlanFrame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val host = concat(lit("www."), lower(col("source")), lit(".com"))
    // sitemap whose paths exercise the robots rule set
    val lastmod = when(pmod(col("doc_id"), lit(3)) === 0, lit(""))
      .otherwise(concat(lit("2025-01-"),
        lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0")))
    val prioVal = when(pmod(col("doc_id"), lit(18)) === 0, lit("1.0"))
      .when(pmod(col("doc_id"), lit(18)) === 6, lit("1"))
      .otherwise(concat(lit("0."), (pmod(col("doc_id"), lit(9)) + 1).cast("string")))
    val prio = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("<priority>"), prioVal, lit("</priority>"))).otherwise(lit(""))
    val pathPart = when(pmod(col("doc_id"), lit(4)) === 0, "/private/")
      .when(pmod(col("doc_id"), lit(4)) === 1, "/private/ok/")
      .when(pmod(col("doc_id"), lit(4)) === 2, "/tmp")
      .otherwise("/public/")
    val entry = concat(lit("<url><loc>HTTPS://WWW."), upper(col("source")),
      lit(".COM:443"), pathPart, lit("page"),
      pmod(col("doc_id"), lit(7)).cast("string"),
      when(pmod(col("doc_id"), lit(5)) === 0, ".tmp").otherwise(""),
      lit("?utm_source=map</loc>"),
      when(lastmod =!= "", concat(lit("<lastmod>"), lastmod, lit("</lastmod>")))
        .otherwise(lit("")),
      prio, lit("</url>"))
    val maps = docs.select(host.as("host"), col("doc_id"), entry.as("entry"))
      .groupBy(col("host"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("xml"))
    // persisted: sm feeds the permit verdicts AND the final join — the
    // urlset-assembly + XML-regex parse chain must run once per call,
    // not once per consumer (the CrawlCycle posture; corpus-bounded)
    val sm = parseSitemap(maps, "host", "xml", recrawlAfter = "2025-01-15")
      .withColumn("path",
        regexp_extract(col("loc_canon"), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // robots: the same three seeded shapes as robotsQ
    val robots = seededRobots(docs)
    val verdicts = decide(sm.select(col("host"), col("path")).distinct(),
        parseRules(robots, "host", "txt"), "GraftBot")
      .select(col("host"), col("path"), col("allowed"))
    sm.join(verdicts, Seq("host", "path"))
      .select(col("host"), col("pos"), col("path"), col("loc_canon"),
        col("priority_ppm"), col("recrawl"), col("allowed"),
        (col("allowed") && col("recrawl")).as("fetch"))
  }

  /** §2 row 249 registered query — the plan frame in (host, pos)
    * order. Internal consumers ([[scheduleQ]]) take [[crawlPlanFrame]]
    * instead: the terminal sort is presentation-only, and feeding it
    * into schedulePlan's host-keyed window would pay a range exchange
    * + sort that the very next hash exchange throws away (guide §2.4
    * — an orderBy used only to make output deterministic). */
  def crawlPlanQ(s: SparkSession, d: String): DataFrame =
    crawlPlanFrame(s, d).orderBy(col("host"), col("pos"))

  /** Per-host politeness scheduling (SURVEY.md §2 row 252) — the
    * third crawl stage after discovery (247) and permission (241):
    * fetchable URLs get per-host fetch slots in (priority DESC, pos)
    * order and exact offsets fetch_at_us = slot · (10⁶/qps). The
    * per-host rank window is the SEMANTICALLY required shape — a
    * polite fetcher is serial per host by definition, so the frame is
    * bounded by one host's frontier, never the corpus; hosts are the
    * parallel unit. Integer micros throughout (qps must divide 10⁶).
    * `delays` is the [[crawlDelays]] frame: a host's declared
    * Crawl-delay overrides the default 10⁶/qps slot interval, so the
    * robots artifact closes discover→permit→plan→schedule by itself. */
  def schedulePlan(plan: DataFrame, qps: Int, delays: DataFrame): DataFrame = {
    require(qps >= 1 && 1000000 % qps == 0,
      s"qps must divide 1e6 for exact integer offsets, got $qps")
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority_ppm").desc, col("pos"))
    plan.filter(col("fetch"))
      .join(delays.select(col("host"), col("crawl_delay_us")), Seq("host"), "left")
      .withColumn("interval_us",
        coalesce(col("crawl_delay_us"), lit(1000000L / qps)))
      .withColumn("slot", (row_number().over(w) - 1).cast(LongType))
      .select(col("host"), col("pos"), col("loc_canon"), col("priority_ppm"),
        col("slot"), col("interval_us"),
        (col("slot") * col("interval_us")).as("fetch_at_us"))
  }

  /** Uniform-qps scheduling (no per-host Crawl-delay overrides). */
  def schedulePlan(plan: DataFrame, qps: Int): DataFrame =
    schedulePlan(plan, qps,
      plan.select(col("host")).limit(0).withColumn("crawl_delay_us", lit(0L)))

  /** §2 row 252 — the row-249 plan scheduled at 4 fetches/second,
    * with each host's declared Crawl-delay overriding the default
    * 250 ms slot interval. */
  def scheduleQ(s: SparkSession, d: String): DataFrame = {
    val robots = seededRobots(Tables.documents(s, d))
    schedulePlan(crawlPlanFrame(s, d), qps = 4,
        crawlDelays(robots, "host", "txt", "GraftBot"))
      .orderBy(col("host"), col("slot"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_robots" -> (robotsQ _),
    "q_sitemap" -> (sitemapQ _),
    "q_crawl_plan" -> (crawlPlanQ _),
    "q_sitemap_index" -> (sitemapIndexQ _),
    "q_crawl_schedule" -> (scheduleQ _))

  /** SQL twin of [[millionthsOf]] over column expression `v`. */
  private[operators] def millionthsSql(v: String): String =
    s"""(CAST('0' || regexp_extract($v, '^([0-9]+)', 1) AS BIGINT) * 1000000
       |      + CAST(substr(rpad(regexp_extract($v, '\\.([0-9]+)', 1), 6, '0'), 1, 6) AS BIGINT))"""
      .stripMargin.replace("\n", " ")

  /** Robots parse/select replay reading CTE `robots(host, txt)`:
    * emits lns…sel with `sel(host, allow, path)` = the rules applying
    * to `agent` (exact groups shadow `*`). Shared by q_robots and
    * q_crawl_plan so the replays cannot drift. */
  private[operators] def robotsSelSql(agent: String): String =
    s"""lns AS (
       |  SELECT host, pos, trim(regexp_replace(raw, '#.*$$', '')) AS line
       |  FROM (SELECT host,
       |          unnest(string_split(txt, chr(10))) AS raw,
       |          unnest(generate_series(1, len(string_split(txt, chr(10))))) AS pos
       |        FROM robots) t),
       |fl AS (
       |  SELECT host, pos,
       |    lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS field,
       |    trim(regexp_replace(line, '^[A-Za-z-]+\\s*:', '')) AS value
       |  FROM lns WHERE line <> ''),
       |fk AS (SELECT * FROM fl
       |       WHERE field IN ('user-agent', 'allow', 'disallow', 'crawl-delay')),
       |grp AS (
       |  SELECT host, pos, field, value,
       |    SUM(CASE WHEN field = 'user-agent'
       |          AND (prevField IS NULL OR prevField <> 'user-agent')
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY host ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM (SELECT *, LAG(field) OVER (PARTITION BY host ORDER BY pos) AS prevField
       |        FROM fk) p),
       |uas AS (
       |  SELECT host, grp, list(DISTINCT lower(value)) AS ua_set
       |  FROM grp WHERE field = 'user-agent' GROUP BY host, grp),
       |rules AS (
       |  SELECT g.host, g.grp,
       |    list_contains(u.ua_set, '$agent') AS exact,
       |    list_contains(u.ua_set, '*') AS star,
       |    g.field = 'allow' AS allow, g.value AS path
       |  FROM grp g JOIN uas u ON g.host = u.host AND g.grp = u.grp
       |  WHERE g.field IN ('allow', 'disallow')),
       |sel AS (
       |  SELECT r.host, r.allow, r.path FROM rules r
       |  JOIN (SELECT host, MAX(CASE WHEN exact THEN 1 ELSE 0 END) AS he
       |        FROM rules WHERE exact OR star GROUP BY host) h
       |    ON r.host = h.host
       |  WHERE ((h.he = 1 AND r.exact) OR (h.he = 0 AND r.star))
       |    AND r.path <> ''),
       |cds AS (
       |  SELECT g.host,
       |    list_contains(u.ua_set, '$agent') AS exact,
       |    list_contains(u.ua_set, '*') AS star,
       |    g.value AS v
       |  FROM grp g JOIN uas u ON g.host = u.host AND g.grp = u.grp
       |  WHERE g.field = 'crawl-delay'
       |    AND regexp_matches(g.value, '^[0-9]+(\\.[0-9]+)?$$')),
       |cdsel AS (
       |  SELECT c.host,
       |    MAX(${millionthsSql("c.v")}) AS crawl_delay_us
       |  FROM cds c
       |  JOIN (SELECT host,
       |          MAX(CASE WHEN list_contains(ua_set, '$agent') THEN 1 ELSE 0 END) AS he
       |        FROM uas GROUP BY host) hh
       |    ON c.host = hh.host
       |  WHERE (hh.he = 1 AND c.exact) OR (hh.he = 0 AND c.star)
       |  GROUP BY c.host),
       |smf AS (
       |  SELECT host, value AS sitemap_url,
       |    ROW_NUMBER() OVER (PARTITION BY host ORDER BY pos) AS rn
       |  FROM fl WHERE field = 'sitemap' AND value <> ''),
       |selx AS (
       |  SELECT host, allow, path,
       |    '^' || replace(replace(replace(replace(replace(replace(replace(
       |      replace(replace(replace(replace(replace(replace(replace(
       |      CASE WHEN path LIKE '%$$' THEN substr(path, 1, length(path) - 1)
       |           ELSE path END,
       |      '\\', '\\\\'), '.', '\\.'), '^', '\\^'), '$$', '\\$$'), '+', '\\+'),
       |      '?', '\\?'), '(', '\\('), ')', '\\)'), '[', '\\['), ']', '\\]'),
       |      '{', '\\{'), '}', '\\}'), '|', '\\|'), '*', '.*')
       |    || (CASE WHEN path LIKE '%$$' THEN '$$' ELSE '' END) AS pat
       |  FROM sel)""".stripMargin

  /** The seeded per-host robots bodies (three shapes), CTE `robots`. */
  private[operators] val robotsBodiesSql: String =
    """d AS (
      |  SELECT doc_id, 'www.' || lower(source) || '.com' AS host,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      '# star only' || chr(10) || 'User-agent: *' || chr(10)
      |      || 'Crawl-delay: 2.5' || chr(10)
      |      || 'Disallow: /private/' || chr(10) || 'Allow: /private/ok/'
      |      || chr(10) || 'Disallow: /tmp' || chr(10)
      |      || 'Disallow: /*.tmp$' || chr(10)
      |      || 'Sitemap: https://www.' || lower(source) || '.com/sitemap.xml'
      |    WHEN doc_id % 3 = 1 THEN
      |      'User-agent: *' || chr(10) || 'Crawl-delay: 10' || chr(10)
      |      || 'Disallow: /' || chr(10)
      |      || 'User-agent: graftbot' || chr(10) || 'User-agent: otherbot'
      |      || chr(10) || 'Crawl-delay: 1' || chr(10)
      |      || 'Disallow: /private/' || chr(10) || 'Allow: /private/ok/'
      |      || chr(10) || 'Disallow: /*.tmp$' || chr(10)
      |      || 'Sitemap: https://www.' || lower(source) || '.com/a.xml'
      |      || chr(10) || 'Sitemap: https://www.' || lower(source) || '.com/b.xml'
      |    ELSE '# no rules here' || chr(10) || '# just comments' END AS txt
      |  FROM documents),
      |robots AS (
      |  SELECT host, txt FROM (
      |    SELECT host, txt, ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rn
      |    FROM d) r WHERE rn = 1)""".stripMargin

  /** Sitemap parse replay reading CTE `xml(host, xml)`: entry unnest,
    * field regexes, canonSql keyed (site, pos), emits
    * `smap(site, pos, loc, loc_canon, lastmod, priority_ppm, recrawl)`.
    * Shared by q_sitemap and q_crawl_plan. */
  private[operators] def sitemapParseSql(cutoff: String): String =
    ("""ent AS (
      |  SELECT host,
      |    unnest(regexp_extract_all(xml, '(?is)<url>(.*?)</url>', 1)) AS e,
      |    unnest(range(0, len(regexp_extract_all(xml, '(?is)<url>(.*?)</url>', 1)))) AS pos
      |  FROM xml),
      |lnk AS (
      |  SELECT host AS site, CAST(pos AS BIGINT) AS pos,
      |    regexp_extract(e, '(?is)<loc>(.*?)</loc>', 1) AS loc,
      |    regexp_extract(e, '(?is)<lastmod>(.*?)</lastmod>', 1) AS lastmod,
      |    regexp_extract(e, '(?is)<priority>\s*([0-9]*\.?[0-9]*)\s*</priority>', 1) AS p,
      |    regexp_extract(e, '(?is)<loc>(.*?)</loc>', 1) AS url
      |  FROM ent
      |  WHERE regexp_extract(e, '(?is)<loc>(.*?)</loc>', 1) <> ''),
      |""".stripMargin
      + Urls.canonSql("lnk", Seq("site", "pos")) + ",\n"
      + s"""smap AS (
         |  SELECT l.site, l.pos, l.loc, c.url_canon AS loc_canon, l.lastmod,
         |    CASE WHEN l.p <> '' THEN ${millionthsSql("l.p")}
         |    ELSE 500000 END AS priority_ppm,
         |    (l.lastmod <> '' AND l.lastmod > '$cutoff') AS recrawl
         |  FROM lnk l JOIN canonized c ON l.site = c.site AND l.pos = c.pos)""".stripMargin)

  /** The full crawl-plan replay, shared by q_crawl_plan and the
    * schedule oracle that ranks its output. */
  private[operators] lazy val crawlPlanOracle: String =
    ("""WITH e0 AS (
         |  SELECT doc_id, 'www.' || lower(source) || '.com' AS host,
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
         |xml AS (
         |  SELECT host, '<urlset>' || string_agg(entry, '' ORDER BY doc_id)
         |    || '</urlset>' AS xml
         |  FROM e0 GROUP BY host),
         |""".stripMargin
        + sitemapParseSql("2025-01-15") + ",\n"
        + robotsBodiesSql + ",\n" + robotsSelSql("graftbot") + """,
        |sp AS (
        |  SELECT site, pos, loc_canon, priority_ppm, recrawl,
        |    regexp_extract(loc_canon, '^[a-z][a-z0-9+.-]*://[^/]*(/.*)$', 1) AS path
        |  FROM smap),
        |m AS (
        |  SELECT u.site, u.path, s.allow,
        |    ROW_NUMBER() OVER (PARTITION BY u.site, u.path
        |      ORDER BY length(s.path) DESC,
        |        CASE WHEN s.allow THEN 1 ELSE 0 END DESC, s.path DESC) AS rn
        |  FROM (SELECT DISTINCT site, path FROM sp) u
        |  LEFT JOIN selx s ON u.site = s.host
        |    AND regexp_matches(u.path, s.pat)),
        |v AS (SELECT site, path, COALESCE(allow, TRUE) AS allowed FROM m WHERE rn = 1)
        |SELECT sp.site AS host, sp.pos, sp.path, sp.loc_canon,
        |  sp.priority_ppm, sp.recrawl, v.allowed,
        |  (v.allowed AND sp.recrawl) AS fetch
        |FROM sp JOIN v ON sp.site = v.site AND sp.path = v.path
        |ORDER BY host, sp.pos""".stripMargin)

  val oracles: Map[String, String] = Map(
    // per-host assembly (ordered string_agg == the sorted-collect
    // join) + the shared sitemapParseSql fragment
    "q_sitemap" ->
      ("""WITH e0 AS (
         |  SELECT doc_id, 'www.' || lower(source) || '.com' AS host,
         |    '<url><loc>HTTPS://WWW.' || upper(source) || '.COM:443/p/'
         |    || CAST(doc_id AS VARCHAR) || '?utm_source=map&v=1</loc>'
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
         |xml AS (
         |  SELECT host, '<urlset>' || string_agg(entry, '' ORDER BY doc_id)
         |    || '</urlset>' AS xml
         |  FROM e0 GROUP BY host),
         |""".stripMargin
        + sitemapParseSql("2025-01-15")
        + """
          |SELECT site AS host, pos, loc, loc_canon, lastmod, priority_ppm, recrawl
          |FROM smap
          |ORDER BY host, pos""".stripMargin),

    // index -> children -> urls: the child urlsets keyed by the
    // composite host|child_loc run the shared sitemapParseSql; the
    // index parse is checked behaviorally (a dropped/garbled index
    // entry loses its child's rows on the engine side)
    "q_sitemap_index" ->
      ("""WITH e0 AS (
         |  SELECT doc_id,
         |    'www.' || lower(source) || '.com' AS h,
         |    'https://www.' || lower(source) || '.com/sm/'
         |      || CAST(doc_id % 2 AS VARCHAR) || '.xml' AS child_loc,
         |    '<url><loc>HTTPS://WWW.' || upper(source) || '.COM:443/p/'
         |    || CAST(doc_id AS VARCHAR) || '?utm_source=map</loc>'
         |    || (CASE WHEN doc_id % 3 <> 0 THEN '<lastmod>2025-01-'
         |          || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         |          || '</lastmod>' ELSE '' END)
         |    || '</url>' AS entry
         |  FROM documents),
         |xml AS (
         |  SELECT h || '|' || child_loc AS host,
         |    '<urlset>' || string_agg(entry, '' ORDER BY doc_id)
         |      || '</urlset>' AS xml
         |  FROM e0 GROUP BY 1),
         |""".stripMargin
        + sitemapParseSql("2025-01-15")
        + """
          |SELECT string_split(site, '|')[1] AS host,
          |  string_split(site, '|')[2] AS child_loc,
          |  pos, loc_canon, lastmod, recrawl
          |FROM smap
          |ORDER BY host, child_loc, pos""".stripMargin),

    // seeded bodies + the shared robotsSelSql fragment; URL verdicts
    // via the (len, allow, path) ROW_NUMBER argmax; unmatched URLs
    // default allowed through the LEFT JOIN
    "q_robots" ->
      ("WITH " + robotsBodiesSql + ",\n" + robotsSelSql("graftbot") + """,
        |urls AS (
        |  SELECT DISTINCT 'www.' || lower(source) || '.com' AS host,
        |    (CASE WHEN doc_id % 4 = 0 THEN '/private/'
        |          WHEN doc_id % 4 = 1 THEN '/private/ok/'
        |          WHEN doc_id % 4 = 2 THEN '/tmp'
        |          ELSE '/public/' END)
        |    || 'page' || CAST(doc_id % 7 AS VARCHAR)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '.tmp' ELSE '' END) AS path
        |  FROM documents),
        |m AS (
        |  SELECT u.host, u.path, s.allow, s.path AS rpath,
        |    ROW_NUMBER() OVER (PARTITION BY u.host, u.path
        |      ORDER BY length(s.path) DESC,
        |        CASE WHEN s.allow THEN 1 ELSE 0 END DESC, s.path DESC) AS rn
        |  FROM urls u
        |  LEFT JOIN selx s ON u.host = s.host
        |    AND regexp_matches(u.path, s.pat)),
        |v AS (SELECT host, path, allow, rpath FROM m WHERE rn = 1)
        |SELECT v.host, v.path,
        |  COALESCE(v.allow, TRUE) AS allowed,
        |  v.rpath AS rule_path,
        |  cd.crawl_delay_us,
        |  COALESCE(sm.sitemap_url, '') AS sitemap_url
        |FROM v
        |LEFT JOIN cdsel cd ON v.host = cd.host
        |LEFT JOIN (SELECT host, sitemap_url FROM smf WHERE rn = 1) sm
        |  ON v.host = sm.host
        |ORDER BY v.host, v.path""".stripMargin),

    // the crawl capstone: sitemap discovery through the robots gate —
    // both fragments shared verbatim with their own green queries
    "q_crawl_plan" -> crawlPlanOracle,

    // the plan replay as a subquery, ranked per host by
    // (priority DESC, pos); each host's declared Crawl-delay (the
    // outer robots/cdsel CTEs) overrides the 4 qps -> 250000 us slots
    "q_crawl_schedule" ->
      ("WITH " + robotsBodiesSql + ",\n" + robotsSelSql("graftbot") + """
         |SELECT t.host, t.pos, t.loc_canon, t.priority_ppm,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY t.host
         |    ORDER BY t.priority_ppm DESC, t.pos) - 1 AS BIGINT) AS slot,
         |  CAST(COALESCE(cd.crawl_delay_us, 250000) AS BIGINT) AS interval_us,
         |  CAST((ROW_NUMBER() OVER (PARTITION BY t.host
         |    ORDER BY t.priority_ppm DESC, t.pos) - 1)
         |    * COALESCE(cd.crawl_delay_us, 250000) AS BIGINT) AS fetch_at_us
         |FROM (
         |""".stripMargin + crawlPlanOracle + """
         |) t
         |LEFT JOIN cdsel cd ON t.host = cd.host
         |WHERE t.fetch
         |ORDER BY t.host, slot""".stripMargin))
}
