package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Gapped sequential-pattern support (SURVEY.md §2 row 304): the
  * relational greedy decomposition must equal brute-force subsequence
  * containment on every (user, pattern) — that equivalence is the
  * operator's whole correctness claim. */
class SeqPatternSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(seqs: Map[Long, Seq[String]]) =
    seqs.toSeq.flatMap { case (u, ts) =>
      ts.zipWithIndex.map { case (t, i) =>
        (u, java.sql.Timestamp.valueOf(f"2026-01-01 00:00:${i}%02d"), i.toLong, t)
      }
    }.toDF("user_id", "ts", "event_id", "event_type")

  private def support(seqs: Map[Long, Seq[String]]): Map[(String, Long), Long] =
    Analytics.gappedSeqSupport(df(seqs), col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def isSubseq(hay: Seq[String], needle: Seq[String]): Boolean = {
    var i = 0
    hay.foreach { t => if (i < needle.size && t == needle(i)) i += 1 }
    i == needle.size
  }

  test("support equals brute-force subsequence containment on a mixed corpus") {
    val seqs = Map(
      1L -> Seq("a", "b", "a", "c"),
      2L -> Seq("c", "c", "b"),
      3L -> Seq("a", "a"),
      4L -> Seq("b"),
      5L -> Seq("c", "a", "b", "a", "c", "b"))
    val got = support(seqs)
    val types = Seq("a", "b", "c")
    for (x <- types; y <- types) {
      val expect = seqs.values.count(isSubseq(_, Seq(x, y))).toLong
      assert(got.getOrElse((s"$x > $y", 2L), 0L) == expect, s"$x > $y")
      for (z <- types) {
        val e3 = seqs.values.count(isSubseq(_, Seq(x, y, z))).toLong
        assert(got.getOrElse((s"$x > $y > $z", 3L), 0L) == e3, s"$x > $y > $z")
      }
    }
  }

  test("gaps are allowed, contiguity is not required, repeats count once per user") {
    val got = support(Map(1L -> Seq("a", "x", "x", "b", "x", "c")))
    assert(got(("a > b > c", 3L)) == 1L) // never contiguous
    assert(got(("a > c", 2L)) == 1L)
    assert(!got.contains(("b > a", 2L))) // order matters
    // a repeated pattern in ONE user still supports 1
    val rep = support(Map(1L -> Seq("a", "b", "a", "b")))
    assert(rep(("a > b", 2L)) == 1L)
    assert(rep(("a > a", 2L)) == 1L) // same-type pairs are subsequences too
  }

  test("the greedy middle step is exact where naive first/last pairing fails") {
    // b>a>b: first(b)=1, last(b)=3, with a at 2 in between — greedy
    // must find it; and a>b>a must also hold
    val got = support(Map(1L -> Seq("b", "a", "b", "a")))
    assert(got(("b > a > b", 3L)) == 1L)
    assert(got(("a > b > a", 3L)) == 1L)
    assert(!got.contains(("a > a > a", 3L))) // only two a's
  }
}
