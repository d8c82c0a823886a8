package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** robots.txt engine (SURVEY.md §2 row 241): RFC 9309 longest-match
  * precedence, Allow tie wins, exact-agent group shadowing, defaults
  * and parser hygiene. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def verdicts(txt: String, paths: Seq[String],
                       agent: String = "bot"): Map[String, (Boolean, Option[String])] = {
    val robots = Seq(("h", txt)).toDF("host", "txt")
    val urls = paths.map(p => ("h", p)).toDF("host", "path")
    Robots.decide(urls, Robots.parseRules(robots, "host", "txt"), agent)
      .as[(String, String, Boolean, Option[String])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
  }

  test("longest matching rule wins; Allow beats Disallow on ties") {
    val txt = "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\nDisallow: /private/ok/"
    val v = verdicts(txt, Seq("/private/x", "/private/ok/x", "/public/y"))
    assert(v("/private/x") == ((false, Some("/private/"))))
    assert(v("/private/ok/x") == ((true, Some("/private/ok/"))),
      "equal-length Allow and Disallow: Allow wins")
    assert(v("/public/y") == ((true, None)), "no rule matches -> allowed")
  }

  test("wildcards: * spans any run, trailing $ anchors, specificity by rule length") {
    val txt = "User-agent: *\nDisallow: /*.tmp$\nAllow: /private/ok/\nDisallow: /private/"
    val v = verdicts(txt, Seq(
      "/notes.tmp", "/deep/dir/x.tmp", "/x.tmpy",
      "/private/ok/keep.tmp", "/private/drop.tmp"))
    assert(v("/notes.tmp") == ((false, Some("/*.tmp$"))))
    assert(v("/deep/dir/x.tmp") == ((false, Some("/*.tmp$"))), "* spans slashes")
    assert(v("/x.tmpy") == ((true, None)), "trailing $ anchors the end")
    // /private/ok/ (12 chars) beats /*.tmp$ (7): rule LENGTH decides
    assert(v("/private/ok/keep.tmp") == ((true, Some("/private/ok/"))))
    assert(v("/private/drop.tmp") == ((false, Some("/private/"))))
  }

  test("wildcards: regex metachars in rule paths stay literal") {
    val txt = "User-agent: *\nDisallow: /a.b\nDisallow: /p(q)\nDisallow: /d$e"
    val v = verdicts(txt, Seq("/a.b", "/aXb", "/p(q)", "/d$e", "/d"))
    assert(v("/a.b") == ((false, Some("/a.b"))))
    assert(v("/aXb") == ((true, None)), "'.' in a rule is a literal dot")
    assert(v("/p(q)") == ((false, Some("/p(q)"))))
    assert(v("/d$e") == ((false, Some("/d$e"))), "inner $ is a literal")
    assert(v("/d") == ((true, None)))
  }

  test("exact agent group shadows the star group completely") {
    val txt = "User-agent: *\nDisallow: /\nUser-agent: bot\nDisallow: /private/"
    val v = verdicts(txt, Seq("/anything", "/private/x"))
    assert(v("/anything") == ((true, None)),
      "the star group's Disallow / must NOT leak into the exact group")
    assert(v("/private/x")._1 == false)
    // an agent with no exact group falls back to star
    val v2 = verdicts(txt, Seq("/anything"), agent = "stranger")
    assert(v2("/anything")._1 == false)
  }

  test("stacked User-agent lines share one group") {
    val txt = "User-agent: alpha\nUser-agent: bot\nDisallow: /x"
    assert(verdicts(txt, Seq("/x/1"))("/x/1")._1 == false)
    assert(verdicts(txt, Seq("/x/1"), agent = "alpha")("/x/1")._1 == false)
  }

  test("comments, blanks, unknown fields and empty Disallow are inert") {
    val txt = "# header\nUser-agent: * # inline\n\nCrawl-delay: 10\nDisallow:\nDisallow: /tmp # why"
    val v = verdicts(txt, Seq("/tmp/x", "/ok"))
    assert(v("/tmp/x")._1 == false)
    assert(v("/ok") == ((true, None)), "empty Disallow allows everything")
  }

  test("agent matching is case-insensitive") {
    val txt = "User-agent: GraftBot\nDisallow: /a"
    assert(verdicts(txt, Seq("/a/x"), agent = "graftbot")("/a/x")._1 == false)
  }

  test("a host with no robots rules allows everything") {
    val v = verdicts("# nothing here", Seq("/any"))
    assert(v("/any") == ((true, None)))
  }

  test("schedule: per-host slots in priority order at exact qps offsets") {
    val plan = Seq(
      ("h1", 0L, "u0", 500000L, true, true, true),
      ("h1", 1L, "u1", 900000L, true, true, true),
      ("h1", 2L, "u2", 900000L, true, false, false), // not fetchable
      ("h2", 0L, "u3", 100000L, true, true, true))
      .toDF("host", "pos", "loc_canon", "priority_ppm", "recrawl", "allowed", "fetch")
    val got = Robots.schedulePlan(plan, qps = 4)
      .orderBy($"host", $"slot")
      .as[(String, Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("h1", 1L, "u1", 900000L, 0L, 250000L, 0L), // highest priority first
      ("h1", 0L, "u0", 500000L, 1L, 250000L, 250000L),
      ("h2", 0L, "u3", 100000L, 0L, 250000L, 0L))) // hosts independent
    intercept[IllegalArgumentException](Robots.schedulePlan(plan, qps = 3))
  }

  test("schedule: a declared Crawl-delay overrides the default interval per host") {
    val plan = Seq(
      ("h1", 0L, "u0", 500000L, true, true, true),
      ("h1", 1L, "u1", 900000L, true, true, true),
      ("h2", 0L, "u3", 100000L, true, true, true))
      .toDF("host", "pos", "loc_canon", "priority_ppm", "recrawl", "allowed", "fetch")
    val delays = Seq(("h1", 2500000L)).toDF("host", "crawl_delay_us")
    val got = Robots.schedulePlan(plan, qps = 4, delays)
      .orderBy($"host", $"slot")
      .as[(String, Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("h1", 1L, "u1", 900000L, 0L, 2500000L, 0L),
      ("h1", 0L, "u0", 500000L, 1L, 2500000L, 2500000L),
      ("h2", 0L, "u3", 100000L, 0L, 250000L, 0L))) // undeclared -> default
  }

  test("crawl-delay: exact group shadows star, fractional parses, max of group wins") {
    val robots = Seq(
      // star 10s, graftbot group 1s then 3s (max 3s wins), fractional star elsewhere
      ("h1", "User-agent: *\nCrawl-delay: 10\nDisallow: /\n" +
        "User-agent: graftbot\nCrawl-delay: 1\nDisallow: /x\nCrawl-delay: 3"),
      ("h2", "User-agent: *\nCrawl-delay: 0.5\nDisallow: /y"),
      ("h3", "User-agent: *\nCrawl-delay: soon\nDisallow: /z"), // non-numeric ignored
      ("h4", "User-agent: *\nDisallow: /w")) // none declared
      .toDF("host", "txt")
    val got = Robots.crawlDelays(robots, "host", "txt", "GraftBot")
      .as[(String, Long)].collect().toMap
    assert(got == Map("h1" -> 3000000L, "h2" -> 500000L))
  }

  test("sitemap index: children in document order, loc required, lastmod optional") {
    val xml = "<sitemapindex>" +
      "<sitemap><loc>https://h/a.xml</loc><lastmod>2025-01-02</lastmod></sitemap>" +
      "<sitemap><lastmod>2025-01-03</lastmod></sitemap>" + // no loc: dropped
      "<sitemap><loc>https://h/b.xml</loc></sitemap>" +
      "</sitemapindex>"
    val got = graft.operators.Robots.parseSitemapIndex(
        Seq(("h", xml)).toDF("host", "xml"), "host", "xml")
      .orderBy($"idx_pos")
      .as[(String, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("h", 0L, "https://h/a.xml", "2025-01-02"),
      ("h", 2L, "https://h/b.xml", "")))
  }

  test("an exact group WITHOUT a delay shadows the star group's delay entirely") {
    // RFC 9309 group selection: the selected group governs even what
    // it does NOT declare — graftbot's group has no Crawl-delay, so
    // none applies (not the star group's 10s)
    val robots = Seq(
      ("h1", "User-agent: *\nCrawl-delay: 10\nDisallow: /\n" +
        "User-agent: graftbot\nDisallow: /private/"),
      ("h2", "User-agent: *\nCrawl-delay: 10\nDisallow: /"))
      .toDF("host", "txt")
    val got = Robots.crawlDelays(robots, "host", "txt", "GraftBot")
      .as[(String, Long)].collect().toMap
    assert(got == Map("h2" -> 10000000L))
  }

  test("sitemap directives surface host-wide in declaration order") {
    val robots = Seq(
      ("h1", "Sitemap: https://h1/a.xml\nUser-agent: *\nDisallow: /\n" +
        "Sitemap: https://h1/b.xml"),
      ("h2", "# comments only"))
      .toDF("host", "txt")
    val got = Robots.sitemapsDeclared(robots, "host", "txt")
      .orderBy($"host", $"sm_pos")
      .as[(String, Long, String)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) ==
      Seq(("h1", "https://h1/a.xml"), ("h1", "https://h1/b.xml")))
  }

  test("sitemap lines are transparent to grouping; crawl-delay ends a UA run") {
    // the Sitemap line sits BETWEEN two User-agent lines: grouping must
    // treat them as ONE stacked run (sitemap is host-wide, not a rule)
    val robots = Seq(("h1",
      "User-agent: a\nSitemap: https://h1/s.xml\nUser-agent: b\nDisallow: /x"))
      .toDF("host", "txt")
    val rules = Robots.parseRules(robots, "host", "txt")
      .select($"ua_set", $"path").as[(Seq[String], String)].collect().toSeq
    assert(rules.size == 1 && rules.head._1.toSet == Set("a", "b"))
    // but a crawl-delay DOES end the run: the second UA starts a new group
    val robots2 = Seq(("h1",
      "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x"))
      .toDF("host", "txt")
    val rules2 = Robots.parseRules(robots2, "host", "txt")
      .select($"ua_set", $"path").as[(Seq[String], String)].collect().toSeq
    assert(rules2.size == 1 && rules2.head._1.toSet == Set("b"))
  }

  test("sitemap: loc canonicalized, optional fields defaulted, recrawl cutoff") {
    val xml = "<urlset>" +
      "<url><loc>HTTP://A.COM:80/x?utm_source=m&id=2</loc>" +
      "<lastmod>2025-02-01</lastmod><priority>0.8</priority></url>" +
      "<url><loc>https://a.com/old</loc><lastmod>2025-01-01</lastmod></url>" +
      "<url><loc>https://a.com/nodate</loc></url>" +
      "<url><lastmod>2025-03-01</lastmod></url>" + // no loc -> dropped
      "</urlset>"
    val got = Robots.parseSitemap(
        Seq(("h", xml)).toDF("host", "xml"), "host", "xml", "2025-01-15")
      .orderBy($"pos")
      .as[(String, Long, String, String, String, Long, Boolean)].collect().toSeq
    assert(got.size == 3)
    assert(got(0)._4 == "http://a.com/x?id=2" && got(0)._6 == 800000L && got(0)._7)
    assert(got(1)._6 == 500000L && !got(1)._7, "old lastmod: no recrawl")
    assert(got(2)._5 == "" && !got(2)._7, "no lastmod: no recrawl")
  }
}
