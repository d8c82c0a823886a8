package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Markup

/** HTML→text extraction (SURVEY.md §2 row 231): tag stripping, head/
  * script/style/comment removal with content, entity decoding order,
  * block segmentation, the link-density boilerplate gate, and
  * adversarial nesting/entity cases. */
class MarkupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(docs: Seq[(Long, String)], pct: Int = 50) =
    Markup.htmlToText(docs.toDF("doc_id", "html"), "doc_id", "html", pct)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("plain paragraph survives; head content is dropped") {
    val got = extract(Seq((1L,
      "<html><head><title>T</title></head><body><p>Hello world</p></body></html>")))
    assert(got == Seq((1L, 1L, 1L, "Hello world")))
  }

  test("script and style bodies are removed WITH their content") {
    val got = extract(Seq((1L,
      "<body><p>keep</p><script>var x = 1; if (x < 2) { x++; }</script>" +
        "<style>p { color: red }</style><p>also</p></body>")))
    assert(got.head._4 == "keep\nalso")
  }

  test("two script blocks stay separate (lazy match, not greedy)") {
    // greedy .* would eat the paragraph between the two scripts
    val got = extract(Seq((1L,
      "<p>a</p><script>1</script><p>middle</p><script>2</script><p>b</p>")))
    assert(got.head._4 == "a\nmiddle\nb")
  }

  test("entities decode in safe order: &amp;lt; stays literal <") {
    // the double-escaped form must decode to the TEXT "&lt;", not to "<"
    val got = extract(Seq(
      (1L, "<p>&lt;tag&gt; &quot;q&quot; &#39;a&#39; x&nbsp;y &amp; z</p>"),
      (2L, "<p>A &amp;lt; B</p>")))
    assert(got(0)._4 == "<tag> \"q\" 'a' x y & z")
    assert(got(1)._4 == "A &lt; B")
  }

  test("nav and link-heavy footer are dropped, content kept") {
    val got = extract(Seq((1L,
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
        "<h1>Title</h1><p>Body text with one <a href=\"x\">link</a> inside.</p>" +
        "<div><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></div>")))
    val (_, nBlocks, nKept, txt) = got.head
    assert(nBlocks == 4 && nKept == 2)
    assert(txt == "Title\nBody text with one link inside.")
  }

  test("link-density threshold is tunable and cross-multiplied") {
    // "Home About" = 10 chars text, 9 link chars → 90% density
    val html = "<div><a>Home</a> <a>About</a></div>"
    assert(extract(Seq((1L, html)), pct = 95).head._3 == 1L)
    assert(extract(Seq((1L, html)), pct = 50).head._3 == 0L)
  }

  test("nested inline tags inside a block are stripped, text joined") {
    val got = extract(Seq((1L,
      "<p>A <b>bold <i>and italic</i></b> run<br>next line</p>")))
    // <br> is a block separator: the paragraph splits there
    assert(got.head._4 == "A bold and italic run\nnext line")
  }

  test("adversarial: unclosed tag eats only to the next '>'") {
    val got = extract(Seq((1L, "<p>ok <span class=\"x\" >fine</span></p>")))
    assert(got.head._4 == "ok fine")
  }

  test("comment containing a fake tag is removed whole") {
    val got = extract(Seq((1L, "<p>a</p><!-- <p>ghost</p> --><p>b</p>")))
    assert(got.head == (1L, 2L, 2L, "a\nb"))
  }

  test("all-boilerplate document survives as empty row (spine rule)") {
    val got = extract(Seq((1L, "<nav><a>x</a> <a>y</a></nav>"), (2L, "<p>z</p>")))
    assert(got(0) == (1L, 1L, 0L, ""))
    assert(got(1) == (2L, 1L, 1L, "z"))
  }

  test("whitespace collapses; blank blocks don't count") {
    val got = extract(Seq((1L, "<div>  </div><p>a   b\t c </p>")))
    assert(got.head == (1L, 1L, 1L, "a b c"))
  }

  test("case-insensitive tags: <SCRIPT>, <P>, </P>") {
    val got = extract(Seq((1L, "<SCRIPT>no</SCRIPT><P>Yes</P>")))
    assert(got.head._4 == "Yes")
  }

  // ---- link extraction (row 239) ----

  private def links(html: String, base: String = "https://www.me.com/dir/page.html") =
    Markup.extractLinks(
        Seq((1L, html, base)).toDF("doc_id", "html", "base"),
        "doc_id", "html", org.apache.spark.sql.functions.col("base"))
      .orderBy($"pos")
      .as[(Long, Long, String, String, String, String, Option[String], Boolean)]
      .collect().toSeq

  test("links: absolute, root-relative and path-relative all resolve") {
    val got = links(
      "<a href=\"HTTP://Other.ORG:80/x\">ext</a>" +
        "<a href=\"/top\">root</a><a href=\"sub/p.html\">rel</a>")
    assert(got.map(_._5) == Seq(
      "http://other.org/x",
      "https://www.me.com/top",
      "https://www.me.com/dir/sub/p.html"))
    assert(got.map(_._8) == Seq(true, false, false))
    assert(got.head._7 == Some("other.org"))
  }

  test("links: script-embedded decoys don't count; anchors clean up") {
    val got = links(
      "<script>var a = '<a href=\"/junk\">x</a>';</script>" +
        "<a href=\"/real\">A <b>bold</b>&nbsp;&amp; real</a>")
    assert(got.size == 1)
    assert(got.head._4 == "A bold & real")
  }

  test("links: base at domain root resolves path-relative against /") {
    val got = links("<a href=\"p.html\">x</a>", base = "https://www.me.com")
    assert(got.head._5 == "https://www.me.com/p.html")
  }

  // ---- metadata extraction (row 245) ----

  private def meta(html: String) =
    Markup.extractMeta(Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, String, String, String, String, String)].collect().head

  test("meta: both attribute orders, entities, first match wins") {
    val m1 = meta("<head><title>A &amp; B</title>" +
      "<meta name=\"description\" content=\"first\">" +
      "<meta name=\"description\" content=\"second\">" +
      "<link rel=\"canonical\" href=\"HTTP://X.COM:80/p#f\"></head>")
    assert(m1._2 == "A & B" && m1._3 == "first")
    assert(m1._6 == "http://x.com/p")
    val m2 = meta("<head><meta content=\"rev order\" name=\"description\">" +
      "<meta content=\"OGT\" property=\"og:title\"></head>")
    assert(m2._3 == "rev order" && m2._4 == "OGT")
  }

  test("meta: absent fields come back empty, never null") {
    val m = meta("<head></head><body>no meta</body>")
    assert(m == ((1L, "", "", "", "", "")))
  }

  // ---- table extraction (row 248) ----

  test("tables: coordinates, header flags, cleanup, multiple tables") {
    val html = "<table><tr><th>H1</th><th>H &amp; 2</th></tr>" +
      "<tr><td>a <b>b</b></td><td> c  d </td></tr></table>" +
      "<p>x</p><table><tr><td>solo</td></tr></table>"
    val got = Markup.extractTables(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .orderBy($"table_idx", $"row_idx", $"col_idx")
      .as[(Long, Long, Long, Long, Boolean, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L, true, "H1"),
      (1L, 0L, 0L, 1L, true, "H & 2"),
      (1L, 0L, 1L, 0L, false, "a b"),
      (1L, 0L, 1L, 1L, false, "c d"),
      (1L, 1L, 0L, 0L, false, "solo")))
  }

  test("linearize: header-keyed rows, positional fallback, header row skipped") {
    val html = "<table><tr><th>Name</th><th>Qty</th></tr>" +
      "<tr><td>alpha</td><td>4</td></tr><tr><td>beta</td><td>7</td></tr></table>" +
      "<table><tr><td>no</td><td>header</td></tr></table>" +
      "<table><tr><th>H</th><td>mixed</td></tr></table>" // mixed row 0 = data
    val got = Markup.linearizeTables(Markup.extractTables(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html"))
      .orderBy($"table_idx", $"row_idx")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 1L, "Name: alpha | Qty: 4"),
      (1L, 0L, 2L, "Name: beta | Qty: 7"),
      (1L, 1L, 0L, "c0: no | c1: header"),
      (1L, 2L, 0L, "c0: H | c1: mixed")))
  }

  test("tables: a page without tables yields no rows") {
    val got = Markup.extractTables(
      Seq((1L, "<p>nothing tabular</p>")).toDF("doc_id", "html"), "doc_id", "html")
    assert(got.count() == 0)
  }

  // ---- JSON-LD extraction (row 251) ----

  test("jsonld: typed blocks only, fields NULL-safe, malformed tolerated") {
    val html = "<script>var a = '{\"@type\":\"Decoy\"}';</script>" +
      "<script type=\"application/ld+json\">{\"@type\":\"Article\",\"headline\":\"H1\"}</script>" +
      "<script type=\"application/ld+json\">not json at all</script>"
    val got = Markup.extractJsonLd(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .orderBy($"block_idx")
      .as[(Long, Long, Option[String], Option[String], Option[String], Option[String])]
      .collect().toSeq
    assert(got.size == 2, "the untyped decoy script must not count")
    assert(got(0)._3 == Some("Article") && got(0)._5 == Some("H1") && got(0)._4.isEmpty)
    assert(got(1)._3.isEmpty && got(1)._4.isEmpty, "malformed JSON yields NULLs, not errors")
  }
}
