package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc
import graft.sources.v2.{WarcScanBuilder, WarcSource}

/** DataSource V2 WARC reader (SURVEY.md §2 row 277): record-level
  * parity with the in-plan Column fold on well-formed AND malformed
  * archives, file pruning from pushed filters, column pruning, and
  * the residual-filter safety contract. */
class WarcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NL = "\r\n"

  private def rec(typ: String, uri: String, body: String): String =
    "WARC/1.0" + NL + s"WARC-Type: $typ" + NL +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri" + NL else "") +
      s"Content-Length: ${body.length}" + NL + NL + body + NL + NL

  private def writeFiles(contents: Map[String, String]): Path = {
    val dir = Files.createTempDirectory("warcsrc_spec")
    contents.foreach { case (name, c) =>
      Files.write(dir.resolve(name), c.getBytes(ISO_8859_1)); ()
    }
    dir
  }

  private def readV2(dir: Path) =
    spark.read.format("graft.sources.v2.WarcSource")
      .option("path", dir.toString).load()

  test("record-level parity with Warc.records, malformed cases included") {
    val trap = "has WARC/1.0" + NL + "inside"
    val contents = Map(
      "a.warc" -> (rec("warcinfo", "", "") +
        rec("response", "http://a/1", "hello") +
        rec("response", "http://a/2", trap)),
      "b.warc" -> ("junk!" + rec("response", "http://b/1", "x") +
        "WARC/1.0" + NL + "WARC-Type: response" + NL + NL + "no length" + NL + NL +
        rec("response", "http://b/2", "y") +
        "WARC/1.0" + NL + "Content-Length: 99" + NL + NL + "truncated"))
    val dir = writeFiles(contents)
    val cols = Seq("file", "rec_pos", "rec_type", "uri", "content_length",
      "body", "ok", "rec_offset", "warc_date")
    val v2 = readV2(dir).select(cols.head, cols.tail: _*)
      .collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1)))
    val fold = Warc.records(
        contents.toSeq.toDF("file", "warc"), "file", "warc")
      .select(cols.head, cols.tail: _*)
      .collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1)))
    assert(v2.nonEmpty && v2 == fold)
  }

  test("an EqualTo file filter prunes partitions to the one matching archive") {
    val dir = writeFiles(Map(
      "h1.warc" -> rec("response", "u1", "a"),
      "h2.warc" -> rec("response", "u2", "b"),
      "h3.warc" -> rec("response", "u3", "c")))
    val all = readV2(dir)
    assert(all.rdd.getNumPartitions == 3)
    val one = readV2(dir).filter($"file" === "h2.warc")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.select("uri").as[String].collect().toSeq == Seq("u2"))
  }

  test("a StartsWith file filter prunes by prefix; results stay exact") {
    val dir = writeFiles(Map(
      "www.x.warc" -> rec("response", "ux", "a"),
      "www.y.warc" -> rec("response", "uy", "b"),
      "cdn.z.warc" -> rec("response", "uz", "c")))
    val pruned = readV2(dir).filter($"file".startsWith("www."))
    assert(pruned.rdd.getNumPartitions == 2)
    assert(pruned.select("uri").as[String].collect().toSet == Set("ux", "uy"))
  }

  test("non-file filters do not prune but still apply (residual safety)") {
    val dir = writeFiles(Map(
      "f1.warc" -> (rec("warcinfo", "", "") + rec("response", "u1", "a")),
      "f2.warc" -> rec("response", "u2", "bb")))
    val df = readV2(dir).filter($"rec_type" === "response")
    assert(df.rdd.getNumPartitions == 2) // no pruning on rec_type
    assert(df.count() == 2)
  }

  test("column pruning reaches the scan builder") {
    val sb = new WarcScanBuilder("/nonexistent")
    sb.pruneColumns(StructType(Seq(StructField("rec_type", StringType))))
    assert(sb.build().readSchema().fieldNames.toSeq == Seq("rec_type"))
  }

  test("a projection away from body executes and returns pruned rows") {
    val dir = writeFiles(Map("p.warc" ->
      (rec("response", "u1", "payload one") + rec("conversion", "u2", "two"))))
    val got = readV2(dir).select("rec_type", "content_length")
      .as[(String, Long)].collect().toSeq.sorted
    assert(got == Seq(("conversion", 3L), ("response", 11L)))
  }

  test("offsets from the file reader are byte-exact") {
    val r1 = rec("response", "u1", "abc")
    val r2 = rec("response", "u2", "defg")
    val dir = writeFiles(Map("o.warc" -> (r1 + r2)))
    val offs = readV2(dir).select("rec_pos", "rec_offset")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(offs == Seq((0L, 0L), (1L, r1.length.toLong)))
  }

  test("hidden and marker files are not treated as archives") {
    val dir = writeFiles(Map(
      "real.warc" -> rec("response", "u1", "a"),
      "_SUCCESS" -> "",
      ".hidden.warc" -> rec("response", "ux", "junk")))
    val got = readV2(dir).select("uri").as[String].collect().toSeq
    assert(got == Seq("u1"))
  }

  test("an overflowing Content-Length flags the record instead of crashing") {
    val w = "WARC/1.0" + NL + "WARC-Type: response" + NL +
      "Content-Length: 99999999999999999999999" + NL + NL + "tiny"
    val recs = WarcSource.parse(w)
    assert(recs.size == 1 && !recs.head.ok)
    assert(recs.head.contentLength == -1L) // normalized, same as the fold
  }

  test("overflowing Content-Length: sequential parser and Column fold agree") {
    // the overflow normalizes to -1 in BOTH paths (the Column fold's
    // Long cast yields NULL -> coalesce -1; the sequential parser
    // catches NumberFormatException -> -1), so the record flags and
    // consumes to segment end, and the FOLLOWING record still parses
    val contents = Map("ovf.warc" ->
      ("WARC/1.0" + NL + "WARC-Type: response" + NL +
        "WARC-Target-URI: http://o/1" + NL +
        "Content-Length: 99999999999999999999999" + NL + NL + "tiny" + NL + NL +
        rec("response", "http://o/2", "after")))
    val dir = writeFiles(contents)
    val cols = Seq("file", "rec_pos", "rec_type", "uri", "content_length",
      "body", "ok", "rec_offset", "warc_date")
    val v2 = readV2(dir).select(cols.head, cols.tail: _*)
      .collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1)))
    val fold = Warc.records(
        contents.toSeq.toDF("file", "warc"), "file", "warc")
      .select(cols.head, cols.tail: _*)
      .collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1)))
    assert(v2.size == 2 && v2 == fold)
    assert(v2.head.getLong(4) == -1L && !v2.head.getBoolean(6))
    assert(v2(1).getString(3) == "http://o/2" && v2(1).getBoolean(6))
  }

  test("parse is the fold: in-payload full fake record does not split") {
    val fake = "WARC/1.0" + NL + "WARC-Type: response" + NL +
      "Content-Length: 3" + NL + NL + "xyz"
    val recs = WarcSource.parse(rec("response", "u1", s"<p>$fake</p>") +
      rec("response", "u2", "tail"))
    assert(recs.map(_.uri) == Vector("u1", "u2"))
    assert(recs.head.body == s"<p>$fake</p>" && recs.forall(_.ok))
  }
}
