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

  private def repair(texts: String*): Seq[(Long, Long, Boolean, String)] =
    Hygiene.mojibakeRepair(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Boolean, String)].collect().toSeq

  test("mojibake repairs: double-encoded accents come back") {
    val got = repair("cafÃ© bar", "naÃ¯ve tÃ©lÃ©")
    assert(got(0) == ((0L, 1L, true, "café bar")))
    assert(got(1)._4 == "naïve télé" && got(1)._2 == 3L)
  }

  test("mojibake guards: real accents, traps and mixed pages untouched") {
    val got = repair(
      "café real",                 // genuine é — no signature
      "Ãx not continuation",       // lead char before ASCII
      "cafÃ© and €")     // mojibake + euro: NOT Latin-1-mappable
    assert(got.forall(r => !r._3), s"nothing may change: $got")
    assert(got(0)._4 == "café real")
    assert(got(2)._4 == "cafÃ© and €",
      "a mixed page must not be half-repaired")
  }

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
