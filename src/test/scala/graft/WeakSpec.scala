package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Weak

/** Labeling-function report (SURVEY.md §2 row 195): hand-computed
  * coverage/polarity/accuracy, pairwise overlap/conflict, majority-vote
  * tie abstention, unlabeled-dev handling, and partitioning
  * invariance. */
class WeakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // votes driven off a single int column so every case is explicit:
  // a: +1 when x>=10, -1 when x<0, abstain otherwise
  // b: +1 when x%2=0, abstain otherwise
  private val lfs = Seq(
    "a" -> when($"x" >= 10, 1L).when($"x" < 0, -1L),
    "b" -> when($"x" % 2 === 0, 1L))

  private def report(xs: Seq[(Int, Int)], parts: Int = 1) =
    Weak.lfReport(xs.toDF("x", "y").repartition(parts), lfs, $"y")
      .orderBy($"name")
      .as[(String, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])]
      .collect().toSeq

  test("hand-computed counts on six rows") {
    // (x, y): a-vote, b-vote, mv
    // (12, 1):  a=+1 b=+1 mv=+1 | (-3, -1): a=-1 b=abst mv=-1
    // (5, 1):   a=ab b=abst mv=abst | (4, -1): a=ab b=+1 mv=+1
    // (-2, 1):  a=-1 b=+1 mv=0→abst | (10, 1): a=+1 b=+1 mv=+1
    val got = report(Seq((12, 1), (-3, -1), (5, 1), (4, -1), (-2, 1), (10, 1)))
    val byName = got.map(r => r._1 -> r).toMap
    // lf_a: votes on 4, pos 2, neg 2, correct: +1@12(y=1)✓, -1@-3(y=-1)✓,
    // -1@-2(y=1)✗, +1@10(y=1)✓ → 3
    assert(byName("lf_a") == (("lf_a", Some(4L), Some(2L), Some(2L), Some(3L), None, None)))
    // lf_b: votes on 4 (12, 4, -2, 10), all +1; correct: y=1,−1,1,1 → 3
    assert(byName("lf_b") == (("lf_b", Some(4L), Some(4L), Some(0L), Some(3L), None, None)))
    // pair: both vote on {12, -2, 10}; conflict only at -2 (a=-1, b=+1)
    assert(byName("pair_a_b") == (("pair_a_b", None, None, None, None, Some(3L), Some(1L))))
    // mv: sums +2, -1, 0, +1, 0, +2 → votes on 4 (two zero-sum abstain),
    // pos 3, neg 1; correct: +1(y=1)✓, -1(y=-1)✓, +1(y=-1)✗, +1(y=1)✓ → 3
    assert(byName("mv") == (("mv", Some(4L), Some(3L), Some(1L), Some(3L), None, None)))
  }

  test("empty input reports all-zero counters, not an empty frame") {
    val got = report(Seq.empty)
    assert(got.size == 4 &&
      got.filter(_._1 != "pair_a_b").forall(r =>
        r._2.contains(0L) && r._3.contains(0L) && r._4.contains(0L) && r._5.contains(0L)))
  }

  test("NULL dev label skips accuracy but not coverage") {
    val df = Seq((12, Some(1)), (10, None)).toDF("x", "y")
    val got = Weak.lfReport(df, lfs, $"y").orderBy($"name")
      .as[(String, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].collect()
    val a = got.find(_._1 == "lf_a").get
    assert(a._2.contains(2L) && a._5.contains(1L))
  }

  test("partitioning invariance") {
    val rows = (1 to 400).map(i => ((i * 7) % 41 - 20, if (i % 3 == 0) 1 else -1))
    assert(report(rows, parts = 1) == report(rows, parts = 13))
  }
}
