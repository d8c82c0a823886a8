package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixOps

/** Longest duplicated substring (SURVEY.md §2 row 256): hand-computed
  * cross-doc and within-doc repeats, parity with a brute-force
  * reference on a seeded corpus, the maxLen cap, and partitioning
  * invariance. */
class SuffixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def top(rows: Seq[(Long, String)], maxLen: Int = 64, k: Int = 5) =
    SuffixOps.longestDupSpans(
        rows.toDF("doc_id", "text"), "doc_id", "text", maxLen, k)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq

  /** Brute-force longest duplicated substring capped at maxLen: all
    * suffixes sorted, max adjacent LCP — the textbook identity the
    * operator distributes. */
  private def brute(texts: Seq[String], maxLen: Int): (Long, String) = {
    val sufs = texts.flatMap(t => (0 until t.length).map(i =>
      t.substring(i, math.min(t.length, i + maxLen)))).sorted
    val lcps = sufs.sliding(2).map { case Seq(a, b) =>
      val l = a.zip(b).takeWhile { case (x, y) => x == y }.size
      (l, a.take(l))
    }.toSeq
    val maxL = lcps.map(_._1).max
    // engine tie rule: len DESC, dup ASC
    (maxL.toLong, lcps.filter(_._1 == maxL).map(_._2).min)
  }

  test("hand-computed cross-doc repeat") {
    val rows = Seq(
      (1L, "abcdefghijklmnop THE QUICK BROWN FOX xyz"),
      (2L, "123456789 THE QUICK BROWN FOX qrs"))
    val got = top(rows)
    assert(got.head._2 == " THE QUICK BROWN FOX " && got.head._1 == 21L)
    // the reported positions really carry that substring in both docs
    val byId = rows.toMap
    val (len, dup, da, pa, db, pb) = got.head
    assert(byId(da).substring(pa.toInt - 1, pa.toInt - 1 + len.toInt) == dup)
    assert(byId(db).substring(pb.toInt - 1, pb.toInt - 1 + len.toInt) == dup)
  }

  test("within-doc repeats count") {
    val got = top(Seq((1L, "PREFIX_COMMON_RUN_1 middle PREFIX_COMMON_RUN_2")))
    assert(got.head._2 == "PREFIX_COMMON_RUN_" && got.head._1 == 18L)
  }

  test("parity with the brute-force reference on a seeded corpus") {
    val rows = (1 to 25).map { i =>
      val words = (1 to 12).map(j => s"w${(i * 7 + j * 13) % 19}")
      (i.toLong, words.mkString(" ") + (if (i % 5 == 0) " SHARED LONG RUN OF TEXT" else ""))
    }
    val got = top(rows).head
    val want = brute(rows.map(_._2), 64)
    assert((got._1, got._2) == want)
  }

  test("repeats longer than maxLen report the cap") {
    val run = "Z" * 100
    val got = top(Seq((1L, s"a $run b"), (2L, s"c $run d")), maxLen = 64)
    // many pairs tie at the 64 cap; the dup-ASC tie rule picks the
    // space-prefixed variant (" " + 63 Z's sorts before 64 Z's)
    assert(got.head._1 == 64L && got.head._2 == " " + "Z" * 63)
  }

  test("partitioning invariance") {
    val rows = (1 to 30).map(i =>
      (i.toLong, s"doc $i body with the recurring phrase number ${i % 3}"))
    val df1 = rows.toDF("doc_id", "text").repartition(1)
    val df13 = rows.toDF("doc_id", "text").repartition(13)
    val a = SuffixOps.longestDupSpans(df1, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    val b = SuffixOps.longestDupSpans(df13, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }
}
