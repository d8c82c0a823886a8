package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Urls

/** URL canonicalization + registered-domain (SURVEY.md §2 row 232):
  * RFC 3986 case rules, default-port strip, tracking-param removal
  * with sort, bounded path normalization, and PSL longest-match with
  * its NULL branches. */
class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(Urls.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  private def reg(hosts: String*): Seq[Option[String]] =
    hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
      .select(Urls.registeredDomain(col("host")).as("r"))
      .as[Option[String]].collect().toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Some/Path") ==
      Seq("https://www.example.com/Some/Path"))
  }

  test("default ports strip, non-default ports survive") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:8443/x", "http://a.com:443/x") ==
      Seq("https://a.com/x", "http://a.com/x",
        "https://a.com:8443/x", "http://a.com:443/x"))
  }

  test("fragment drops; tracking params drop; rest sorts") {
    assert(canon("http://a.com/p?z=1&utm_campaign=c&a=2&gclid=g&fbclid=f#sec") ==
      Seq("http://a.com/p?a=2&z=1"))
    // all params tracking → no '?'
    assert(canon("http://a.com/p?utm_source=x") == Seq("http://a.com/p"))
  }

  test("path normalization: /./ and // collapse, depth-2 ..") {
    assert(canon("http://a.com/a/./b//c/../d") == Seq("http://a.com/a/b/d"))
    assert(canon("http://a.com/a/b/../../c") == Seq("http://a.com/c"))
    assert(canon("http://a.com") == Seq("http://a.com/"))
  }

  test("registered domain: longest suffix wins") {
    assert(reg("www.example.com", "news.bbc.co.uk", "me.github.io",
      "a.b.github.io") ==
      Seq(Some("example.com"), Some("bbc.co.uk"), Some("me.github.io"),
        Some("b.github.io")))
  }

  test("registered domain NULL branches: unknown TLD, bare suffix") {
    assert(reg("host.example", "co.uk", "com", "localhost") ==
      Seq(None, None, None, None))
  }

  test("multi-label suffix beats its own tail: co.uk over uk") {
    // 'uk' alone is in the list too — k=2 must win
    assert(reg("shop.example.co.uk") == Seq(Some("example.co.uk")))
  }

  test("surt key: reversed labels, www stripped, port kept, path?query verbatim") {
    import graft.operators.Urls
    val got = Seq(
        "https://www.example.com/a/B.html?x=1",
        "https://sub.example.co.uk/",
        "https://www.example.com:8080/p",
        "https://example.com/p?b=2&a=1")
      .toDF("u").select(Urls.surtKey(col("u"))).as[String].collect().toSeq
    assert(got == Seq(
      "com,example)/a/B.html?x=1",
      "uk,co,example,sub)/",
      "com,example:8080)/p",
      "com,example)/p?b=2&a=1"))
  }

  test("surt keys sort one domain's captures contiguously, subdomains after") {
    import graft.operators.Urls
    val keys = Seq("https://www.example.com/z", "https://example.com/a",
        "https://sub.example.com/a", "https://examplf.com/a")
      .toDF("u").select(Urls.surtKey(col("u"))).as[String].collect().toSeq
    val sorted = keys.sorted
    // example.com's two hosts (www-stripped == apex) group before the
    // subdomain, and the lexicographic neighbor domain lands after
    assert(sorted == Seq("com,example)/a", "com,example)/z",
      "com,example,sub)/a", "com,examplf)/a"))
  }
}
