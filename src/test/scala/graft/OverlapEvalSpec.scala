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

  test("pass@k: exact rational against C(n-c,k)/C(n,k), both saturation edges") {
    import org.apache.spark.sql.functions.col
    // task 1: n=4, c=2, k=2 -> 1 - C(2,2)/C(4,2) = 1 - 1/6 = 5/6
    // task 2: n=3, c=0 -> pass = 0;  task 3: n=3, c=3 -> pass = 1
    // task 4: n=1 < k=2 -> NULL
    val rows = Seq(
      (1L, true), (1L, true), (1L, false), (1L, false),
      (2L, false), (2L, false), (2L, false),
      (3L, true), (3L, true), (3L, true),
      (4L, true)).toDF("task_id", "passed")
    val got = OverlapEval.passAtK(rows, col("task_id"), col("passed"), Seq(2))
      .orderBy(col("task_id"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, 2L, 4L, 2L, Some(10L), Some(12L), Some(833333L)),
      (2L, 2L, 3L, 0L, Some(0L), Some(6L), Some(0L)),
      (3L, 2L, 3L, 3L, Some(6L), Some(6L), Some(1000000L)),
      (4L, 2L, 1L, 1L, None, None, None)))
  }

  test("pass@1 is the pass rate; c > n-k collapses the miss product to 0") {
    import org.apache.spark.sql.functions.col
    // n=5, c=3, k=1: pass@1 = 3/5 = 600000 ppm
    val rows = (1 to 5).map(i => (1L, i <= 3)).toDF("task_id", "passed")
    val one = OverlapEval.passAtK(rows, col("task_id"), col("passed"), Seq(1))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(one._7 == Some(600000L))
    // k=3 with c=3 of n=5: miss = max(2,0)*max(1,0)*max(0,0) = 0 -> pass = 1
    val three = OverlapEval.passAtK(rows, col("task_id"), col("passed"), Seq(3))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(three._5 == three._6 && three._7 == Some(1000000L))
  }
}
