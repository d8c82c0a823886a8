package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hygiene

/** Charset anomaly filter (SURVEY.md §2 row 187): byte-vs-char gaps,
  * homoglyph and control detection, the replacement character, the
  * percentage gate, and clean-text negatives. */
class CharsetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scan(docs: Seq[(Long, String)], pctMax: Int = 5) =
    Hygiene.charsetAnomalies(docs.toDF("doc_id", "text"), "doc_id", "text", pctMax)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq

  test("clean ASCII: bytes == chars, nothing suspect") {
    val got = scan(Seq((1L, "plain ascii text")))
    val (_, nc, nb, na, ctl, rep, sus) = got.head
    assert(nc == nb && na == 0 && ctl == 0 && rep == 0 && !sus)
  }

  test("a Cyrillic homoglyph shows as a byte/char gap and non-ascii count") {
    // 'а' (U+0430) is 2 UTF-8 bytes
    val got = scan(Seq((1L, "dаta"))) // the second char is Cyrillic
    val (_, nc, nb, na, _, _, sus) = got.head
    assert(nc == 4 && nb == 5 && na == 1)
    assert(sus, "1/4 > 5% → suspect")
  }

  test("one control character flags regardless of ratio") {
    val got = scan(Seq((1L, "x" * 1000 + "")))
    assert(got.head._5 == 1L && got.head._7)
  }

  test("tab and newline are NOT control anomalies") {
    val got = scan(Seq((1L, "col1\tcol2\nrow2")))
    assert(got.head._5 == 0L && !got.head._7)
  }

  test("replacement character U+FFFD flags") {
    val got = scan(Seq((1L, "dec�ded")))
    assert(got.head._6 == 1L && got.head._7)
  }

  test("the percentage gate: below threshold stays clean") {
    // 1 accented char in 100 → 1% ≤ 5%
    val got = scan(Seq((1L, "é" + "x" * 99)))
    val (_, nc, _, na, _, _, sus) = got.head
    assert(nc == 100 && na == 1 && !sus)
  }
}
