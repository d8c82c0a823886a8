package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OverlapEval

/** N-gram overlap F1 (SURVEY.md §2 row 276): the BLEU clipping rule,
  * hand-computed precision/recall, bigram windows, and the NULL
  * posture on empty sides. */
class OverlapEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(cand: String, ref: String, ns: Seq[Int]) =
    OverlapEval.ngramF1(Seq((1L, cand, ref)).toDF("id", "cand", "ref"),
        "id", "cand", "ref", ns)
      .orderBy($"n")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq

  test("clipping: repeating a reference word cannot farm precision") {
    // the classic BLEU degenerate: cand = "the the the", ref has ONE 'the'
    val got = score("the the the", "the cat sat", Seq(1)).head
    assert(got == ((1L, 1L, 1L, 3L, 3L, Some(1.0 / 3), Some(1.0 / 3), Some(2.0 * 1 / 6))))
  }

  test("identical texts give P = R = F1 = 1 at both gram sizes") {
    val got = score("a b c d", "a b c d", Seq(1, 2))
    assert(got.map(_._3) == Seq(4L, 3L))
    assert(got.forall(r => r._6 == Some(1.0) && r._7 == Some(1.0) && r._8 == Some(1.0)))
  }

  test("hand-computed bigram case with a repeated gram on both sides") {
    // cand: "a b a b x" -> bigrams: ab, ba, ab, bx  (ab x2)
    // ref:  "a b a b"   -> bigrams: ab, ba, ab      (ab x2)
    // clip: min(2,2) + min(1,1) = 3; n_cand=4, n_ref=3
    val got = score("a b a b x", "a b a b", Seq(2)).head
    assert(got._3 == 3L && got._4 == 4L && got._5 == 3L)
    assert(got._6 == Some(3.0 / 4) && got._7 == Some(1.0))
    assert(got._8 == Some(6.0 / 7))
  }

  test("disjoint texts score zero; empty candidate yields NULL precision") {
    val z = score("x y", "p q", Seq(1)).head
    assert(z._3 == 0L && z._6 == Some(0.0) && z._8 == Some(0.0))
    val e = score("", "p q", Seq(1, 2)).head
    assert(e._4 == 0L && e._6.isEmpty && e._7 == Some(0.0))
  }

  test("texts shorter than n emit empty gram sides, not a descending sequence") {
    val got = score("one", "two", Seq(2)).head
    assert(got._4 == 0L && got._5 == 0L)
    assert(got._6.isEmpty && got._7.isEmpty && got._8.isEmpty)
  }

  test("case-folds and collapses ragged whitespace before gramming") {
    val got = score("The  CAT", "the cat", Seq(1, 2))
    assert(got.forall(_._8 == Some(1.0)))
  }

  test("NULL text counts as an empty side, not legacy size(NULL) = -1") {
    val got = score(null, "p q", Seq(1)).head
    assert(got._3 == 0L && got._4 == 0L && got._5 == 2L)
    assert(got._6.isEmpty && got._7 == Some(0.0) && got._8 == Some(0.0))
  }
}
