package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC container reader (SURVEY.md §2 row 254): Content-Length
  * carving with in-payload markers, the warcinfo/response/conversion
  * record types, and the malformed-record tolerance contract (flag,
  * never drop or crash). */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NL = "\r\n"

  private def rec(typ: String, uri: String, body: String): String =
    "WARC/1.0" + NL + s"WARC-Type: $typ" + NL +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri" + NL else "") +
      s"Content-Length: ${body.length}" + NL + NL + body + NL + NL

  private def parse(warc: String) =
    Warc.records(Seq(("f", warc)).toDF("file", "warc"), "file", "warc")
      .select("file", "rec_pos", "rec_type", "uri", "content_length", "body", "ok")
      .as[(String, Long, String, String, Long, String, Boolean)]
      .collect().toSeq.sortBy(_._2)

  private def offsets(warc: String) =
    Warc.records(Seq(("f", warc)).toDF("file", "warc"), "file", "warc")
      .select("rec_pos", "rec_offset", "warc_date")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("well-formed records parse in order with exact payloads") {
    val w = rec("warcinfo", "", "") +
      rec("response", "http://a/1", "hello world") +
      rec("conversion", "http://a/1", "hello")
    val got = parse(w)
    assert(got.map(r => (r._3, r._4, r._5, r._6, r._7)) == Seq(
      ("warcinfo", "", 0L, "", true),
      ("response", "http://a/1", 11L, "hello world", true),
      ("conversion", "http://a/1", 5L, "hello", true)))
  }

  test("a payload containing the version marker does not split the record") {
    val trap = "about WARC/1.0" + NL + "markers: WARC/1.0" + NL + "twice"
    val w = rec("response", "http://a/1", trap) + rec("response", "http://a/2", "next")
    val got = parse(w)
    assert(got.size == 2)
    assert(got.head._6 == trap && got.head._7)
    assert(got(1)._6 == "next" && got(1)._7)
  }

  test("a payload embedding a complete fake record stays one record") {
    val fake = "WARC/1.0" + NL + "WARC-Type: response" + NL +
      "Content-Length: 3" + NL + NL + "xyz"
    val w = rec("response", "http://a/1", s"<p>$fake</p>") +
      rec("response", "http://a/2", "real")
    val got = parse(w)
    assert(got.map(_._4) == Seq("http://a/1", "http://a/2"))
    assert(got.head._6 == s"<p>$fake</p>")
  }

  test("truncated trailing record is flagged, not dropped") {
    val w = rec("response", "http://a/1", "ok") +
      "WARC/1.0" + NL + "WARC-Type: response" + NL +
      "WARC-Target-URI: http://a/2" + NL +
      "Content-Length: 100" + NL + NL + "only this much"
    val got = parse(w)
    assert(got.size == 2)
    assert(got.head._7)
    assert(got(1)._4 == "http://a/2" && got(1)._5 == 100L && !got(1)._7)
    assert(got(1)._6 == "only this much")
  }

  test("missing Content-Length is flagged with length -1") {
    val w = "WARC/1.0" + NL + "WARC-Type: response" + NL +
      "WARC-Target-URI: http://a/1" + NL + NL + "body?" + NL + NL +
      rec("response", "http://a/2", "fine")
    val got = parse(w)
    assert(got.size == 2)
    assert(got.head._5 == -1L && !got.head._7)
    assert(got(1)._4 == "http://a/2" && got(1)._7)
  }

  test("junk between records flags the preceding record only") {
    val w = rec("response", "http://a/1", "ok").stripSuffix(NL + NL) +
      NL + NL + "JUNK BYTES" + rec("response", "http://a/2", "fine")
    val got = parse(w)
    assert(got.size == 2)
    assert(!got.head._7 && got.head._6 == "ok")
    assert(got(1)._7 && got(1)._6 == "fine")
  }

  test("bytes before the first marker are skipped") {
    val got = parse("leading junk" + rec("response", "http://a/1", "x"))
    assert(got.size == 1 && got.head._6 == "x" && got.head._7)
  }

  test("empty and marker-free inputs yield zero records") {
    assert(parse("").isEmpty)
    assert(parse("no records here at all").isEmpty)
  }

  test("httpBody strips the HTTP message headers, passes non-HTTP payloads through") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("HTTP/1.1 200 OK" + NL + "Content-Type: text/html" + NL + NL + "<p>x</p>",
        "<p>x</p>"),                       // response: entity after the blank line
      ("HTTP/1.1 204 No Content" + NL + NL, ""), // headers only
      ("plain WET text, no message", "plain WET text, no message"),
      ("HTTP/1.1 broken, no blank line", "HTTP/1.1 broken, no blank line"))
    val got = rows.map(_._1).toDF("p")
      .select(Warc.httpBody(col("p"))).as[String].collect().toSeq
    assert(got == rows.map(_._2))
  }

  test("record offsets are exact, including across a glued in-payload marker") {
    val trap = "x WARC/1.0" + NL + "y"
    val r1 = rec("response", "http://a/1", "hello")
    val r2 = rec("response", "http://a/2", trap) // split glues this one back
    val r3 = rec("response", "http://a/3", "z")
    val got = offsets(r1 + r2 + r3)
    assert(got.map(_._2) == Seq(0L, r1.length.toLong, (r1 + r2).length.toLong))
  }

  test("offsets skip a junk prefix; a dated record carries WARC-Date") {
    val r1 = "WARC/1.0" + NL + "WARC-Type: response" + NL +
      "WARC-Date: 2024-03-04T05:06:07Z" + NL +
      "Content-Length: 2" + NL + NL + "ab" + NL + NL
    val got = offsets("junk!" + r1 + rec("response", "http://a/2", "c"))
    assert(got.map(_._2) == Seq(5L, 5L + r1.length.toLong))
    assert(got.map(_._3) == Seq("2024-03-04T05:06:07Z", ""))
  }

  test("a truncated trailing record still reports its marker offset") {
    val r1 = rec("response", "http://a/1", "ok")
    val w = r1 + "WARC/1.0" + NL + "Content-Length: 100" + NL + NL + "short"
    val got = offsets(w)
    assert(got.map(_._2) == Seq(0L, r1.length.toLong))
  }

  test("multi-file frame keys records by file") {
    val df = Seq(
        ("f1", rec("response", "u1", "a")),
        ("f2", rec("response", "u2", "bb") + rec("response", "u3", "ccc")))
      .toDF("file", "warc")
    val got = Warc.records(df, "file", "warc")
      .select("file", "rec_pos", "rec_type", "uri", "content_length", "body", "ok")
      .as[(String, Long, String, String, Long, String, Boolean)]
      .collect().toSeq
    assert(got.count(_._1 == "f1") == 1)
    assert(got.count(_._1 == "f2") == 2)
    assert(got.filter(_._1 == "f2").sortBy(_._2).map(_._6) == Seq("bb", "ccc"))
  }
}
