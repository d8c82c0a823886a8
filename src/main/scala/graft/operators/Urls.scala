package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** URL canonicalization + registered-domain extraction (SURVEY.md §2
  * row 232) — the gate that turns a crawl's raw URLs into the
  * `domain` key every domain-keyed operator downstream already uses
  * (MixtureOps temperature mixing row 99, chi² tokens row 121,
  * PageRank row 114). Two pieces:
  *
  *  - [[canonicalUrl]]: lowercase scheme+host, strip default ports
  *    (http:80 / https:443), drop the fragment, drop tracking params
  *    (`utm_*`, `gclid`, `fbclid`) and SORT the survivors (param
  *    order is transport noise), normalize the path (`/./` removal,
  *    `//` collapse, bounded `..` resolution — two passes, depth-2,
  *    documented: crawl frontiers cap traversal depth the same way).
  *    Path CASE is preserved — only scheme/host are case-insensitive
  *    per RFC 3986.
  *  - [[registeredDomain]]: longest-suffix match of the host against
  *    a bundled static public-suffix subset (the PSL pattern:
  *    "registered domain" = one label + the longest matching public
  *    suffix, so `a.b.github.io` groups as `b.github.io`, not
  *    `github.io`). NULL when no suffix matches (unknown TLD) or the
  *    host IS a bare suffix.
  *
  * Scale shape: both are pure per-row codegen'd column pipelines —
  * regex decomposition, array ops over ≤ label-count elements, a
  * literal-array suffix probe (the suffix table is static and tiny:
  * it rides the plan, not a broadcast). Zero shuffles, zero UDFs. */
object Urls {

  /** Bundled public-suffix subset (static; the full PSL is a config
    * swap — same longest-match semantics). Multi-label suffixes make
    * the longest-match real: `co.uk` must beat `uk`. */
  val publicSuffixes: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "ai", "dev",
    "app", "info", "biz", "co", "us", "uk", "de", "fr", "jp", "cn",
    "ru", "br", "in", "au", "ca", "nl", "se", "es", "it", "eu", "ch",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "co.in",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def afterScheme(url: Column): Column =
    regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Lowercased host (no port, no userinfo handling — crawl URLs). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(regexp_extract(afterScheme(url), "^([^/?#]*)", 1),
      "^([^:]*)", 1))

  /** Canonical form; see object doc for the exact rule set. */
  def canonicalUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val hostport = regexp_extract(afterScheme(url), "^([^/?#]*)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = when(
      (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443") || port === "", lit(""))
      .otherwise(concat(lit(":"), port))
    val pathqf = regexp_replace(afterScheme(url), "^[^/?#]*", "")
    val rawPath = regexp_extract(pathqf, "^([^?#]*)", 1)
    // /./ removal, // collapse, then two bounded ../ passes (depth-2).
    // Consuming-separator form (the captured `(/|$)` survives), NOT a
    // lookahead — RE2 has no lookahead, and the consuming form keeps
    // Java and RE2 replacement semantics identical on adjacent hits.
    val p1 = regexp_replace(regexp_replace(regexp_replace(
      rawPath, "/\\.(/|$)", "$1"), "//+", "/"), "/\\.(/|$)", "$1")
    val p2 = regexp_replace(regexp_replace(
      p1, "/[^/.][^/]*/\\.\\.(/|$)", "$1"), "/[^/.][^/]*/\\.\\.(/|$)", "$1")
    val path = when(p2 === "", lit("/")).otherwise(p2)
    val query = regexp_extract(pathqf, "\\?([^#]*)", 1)
    val params = sort_array(filter(split(query, "&"),
      x => x =!= "" && !x.rlike("^(utm_[^=]*|gclid|fbclid)=")))
    val qpart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, keepPort, path, qpart)
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the Heritrix/
    * CDX ordering key) of a CANONICAL url ([[canonicalUrl]] output):
    * host labels reversed and comma-joined so one domain's pages sort
    * contiguously (`com,example)/a` then `com,example,sub)/b`), the
    * scheme dropped (canonical-search form), a leading `www.`
    * stripped, a non-default port kept as `:port`, then `)` + the
    * canonical path?query. Pure per-row codegen'd string ops. */
  def surtKey(canon: Column): Column = {
    val after = regexp_replace(canon, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(after, "^([^/?#]*)", 1)
    val host = regexp_extract(hostport, "^([^:]*)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val noWww = regexp_replace(host, "^www\\.", "")
    val rev = array_join(reverse(split(noWww, "\\.")), ",")
    val pathq = regexp_replace(after, "^[^/?#]*", "")
    concat(rev,
      when(port === "", lit("")).otherwise(concat(lit(":"), port)),
      lit(")"), pathq)
  }

  /** DuckDB twin of [[surtKey]] over a canonical-url SQL expression.
    * Single-line on purpose: callers embed it inside stripMargin
    * blocks, where a margined fragment would be re-stripped. */
  private[operators] def surtSql(canonCol: String): String = {
    val after = s"regexp_replace($canonCol, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val hostport = s"regexp_extract($after, '^([^/?#]*)', 1)"
    val host = s"regexp_extract($hostport, '^([^:]*)', 1)"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    s"array_to_string(list_reverse(string_split(regexp_replace($host, '^www\\.', ''), '.')), ',')" +
      s" || (CASE WHEN $port = '' THEN '' ELSE ':' || $port END)" +
      s" || ')' || regexp_replace($after, '^[^/?#]*', '')"
  }

  /** Longest public-suffix match + one label; NULL if no suffix
    * matches or the host is a bare suffix. */
  def registeredDomain(host: Column): Column = {
    val suffixLit = typedLit(publicSuffixes)
    val labels = split(host, "\\.")
    val n = size(labels)
    val matchedKs = filter(
      transform(sequence(lit(1), n),
        k => when(array_contains(suffixLit,
          array_join(slice(labels, -k, k), ".")), k)),
      x => x.isNotNull)
    val mk = array_max(matchedKs)
    when(mk.isNotNull && mk < n,
      array_join(slice(labels, -(mk + lit(1)), mk + lit(1)), "."))
  }

  /** Registered query: deterministic raw URLs seeded from documents
    * IN BOTH ENGINES — shouting-case scheme/host, default and
    * non-default ports, `/./` + `..` path noise, tracking params out
    * of order, a fragment, and a TLD rotation (com / co.uk /
    * github.io / an unknown `.example`) so the longest-suffix match
    * and its NULL branch are all exercised. */
  def urlCanonQ(s: SparkSession, dir: String): DataFrame = {
    val tld = when(pmod(col("doc_id"), lit(4)) === 0, ".COM")
      .when(pmod(col("doc_id"), lit(4)) === 1, ".Co.UK")
      .when(pmod(col("doc_id"), lit(4)) === 2, ".GitHub.IO")
      .otherwise(".Example")
    val scheme = when(pmod(col("doc_id"), lit(2)) === 0, "HTTPS").otherwise("HTTP")
    val port = when(pmod(col("doc_id"), lit(3)) === 0,
        when(pmod(col("doc_id"), lit(2)) === 0, ":443").otherwise(":80"))
      .when(pmod(col("doc_id"), lit(3)) === 1, lit(":8080"))
      .otherwise(lit(""))
    val url = concat(scheme, lit("://WWW."), upper(col("source")), tld, port,
      lit("/Dir/./sub/"), pmod(col("doc_id"), lit(5)).cast("string"),
      lit("/../Page.Html?utm_source=feed&id="), col("doc_id").cast("string"),
      lit("&b=2&a=1&gclid=xyz#frag"))
    val base = Tables.documents(s, dir).select(col("doc_id"), url.as("url"))
    base.select(col("doc_id"), col("url"),
        canonicalUrl(col("url")).as("url_canon"),
        hostOf(col("url")).as("host"))
      .withColumn("registered_domain", registeredDomain(col("host")))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_canon" -> (urlCanonQ _))

  /** Reusable SQL replay of [[canonicalUrl]] + [[registeredDomain]]:
    * emits a CTE chain turning `inRel(keys..., url)` into
    * `canonized(keys..., url, url_canon, host, registered_domain)` —
    * same regexes as the engine (RE2 has no lookahead, so the bounded
    * path passes keep the consumed separator via `\1`), params via
    * list_filter + list_sort (binary order both engines), the suffix
    * longest-match as a LATERAL k-range join against the same literal
    * suffix list. Keyed by `keys` so link-level callers (one row per
    * (doc, link)) compose it too. */
  private[operators] def canonSql(inRel: String, keys: Seq[String]): String = {
    val sx = publicSuffixes.map(s => s"('$s')").mkString(", ")
    val k = keys.mkString(", ")
    def kq(a: String) = keys.map(x => s"$a.$x").mkString(", ")
    val joinOn = keys.map(x => s"chl.$x = cmk.$x").mkString(" AND ")
    val joinOn2 = keys.map(x => s"cc.$x = creg.$x").mkString(" AND ")
    s"""cparts AS (
       |  SELECT $k, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_extract(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1) AS hostport,
       |    regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/?#]*', '') AS pathqf
       |  FROM $inRel),
       |ccomp AS (
       |  SELECT $k, url, scheme,
       |    lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |    regexp_extract(pathqf, '^([^?#]*)', 1) AS rawpath,
       |    regexp_extract(pathqf, '\\?([^#]*)', 1) AS query
       |  FROM cparts),
       |cnorm AS (
       |  SELECT $k, url, scheme, host, port, query,
       |    regexp_replace(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(
       |        rawpath, '/\\.(/|$$)', '\\1', 'g'), '//+', '/', 'g'),
       |        '/\\.(/|$$)', '\\1', 'g'),
       |      '/[^/.][^/]*/\\.\\.(/|$$)', '\\1', 'g'),
       |      '/[^/.][^/]*/\\.\\.(/|$$)', '\\1', 'g') AS p2
       |  FROM ccomp),
       |ccanon AS (
       |  SELECT $k, url, host,
       |    scheme || '://' || host
       |    || (CASE WHEN (scheme = 'http' AND port = '80')
       |              OR (scheme = 'https' AND port = '443')
       |              OR port = '' THEN '' ELSE ':' || port END)
       |    || (CASE WHEN p2 = '' THEN '/' ELSE p2 END)
       |    || (CASE WHEN len(pk) > 0 THEN '?' || array_to_string(pk, '&') ELSE '' END)
       |    AS url_canon
       |  FROM (SELECT *,
       |    list_sort(list_filter(string_split(query, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid)='))) AS pk
       |    FROM cnorm) n),
       |csx(s) AS (VALUES $sx),
       |chl AS (SELECT $k, host, string_split(host, '.') AS ls FROM ccanon),
       |cmk AS (
       |  SELECT ${kq("c")}, MAX(c.k) AS mk
       |  FROM (SELECT $k, host, ls, CAST(kk.k AS INT) AS k
       |        FROM chl, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS k) kk) c
       |  JOIN csx ON array_to_string(c.ls[len(c.ls) - c.k + 1:], '.') = csx.s
       |  GROUP BY ${kq("c")}),
       |creg AS (
       |  SELECT ${kq("chl")},
       |    CASE WHEN cmk.mk IS NOT NULL AND cmk.mk < len(chl.ls)
       |      THEN array_to_string(chl.ls[len(chl.ls) - cmk.mk:], '.') END AS registered_domain
       |  FROM chl LEFT JOIN cmk ON $joinOn),
       |canonized AS (
       |  SELECT ${kq("cc")}, cc.url, cc.url_canon, cc.host, creg.registered_domain
       |  FROM ccanon cc JOIN creg ON $joinOn2)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same seeding; the canonSql fragment replays the full rule set.
    // Composed by CONCATENATION — embedding an already-stripped
    // fragment inside another stripMargin would re-strip its
    // `|| (CASE` continuation lines into bare `|` operators.
    "q_url_canon" ->
      (s"""WITH raw AS (
          |  SELECT doc_id,
          |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'HTTP' END)
          |    || '://WWW.' || upper(source)
          |    || (CASE WHEN doc_id % 4 = 0 THEN '.COM'
          |             WHEN doc_id % 4 = 1 THEN '.Co.UK'
          |             WHEN doc_id % 4 = 2 THEN '.GitHub.IO'
          |             ELSE '.Example' END)
          |    || (CASE WHEN doc_id % 3 = 0 THEN
          |               (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
          |             WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
          |    || '/Dir/./sub/' || CAST(doc_id % 5 AS VARCHAR)
          |    || '/../Page.Html?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
          |    || '&b=2&a=1&gclid=xyz#frag' AS url
          |  FROM documents),
          |""".stripMargin
        + canonSql("raw", Seq("doc_id"))
        + """
          |SELECT doc_id, url, url_canon, host, registered_domain
          |FROM canonized
          |ORDER BY doc_id""".stripMargin))
}
