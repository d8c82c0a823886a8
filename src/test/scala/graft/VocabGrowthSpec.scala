package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Vocabulary growth curve (SURVEY.md §2 row 179): hand-computed
  * checkpoints, monotonicity, first-occurrence semantics, empty
  * prefixes, and partitioning invariance. */
class VocabGrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vg(docs: Seq[(Long, String)], steps: Int = 10, parts: Int = 1) =
    CorpusOps.vocabGrowth(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", steps)
      .orderBy($"pct")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("hand-computed two-step curve") {
    // docs 1..4; steps=2 → cutoffs 2 and 4
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "d"))
    val got = vg(docs, steps = 2)
    assert(got == Seq((50L, 2L, 4L, 3L), (100L, 4L, 7L, 4L)))
  }

  test("both n_tokens and vocab are monotone in pct") {
    val docs = (1L to 30L).map(i => (i, s"w${i % 9} w${i % 5} common"))
    val got = vg(docs)
    assert(got.sliding(2).forall { case Seq(a, b) =>
      a._3 <= b._3 && a._4 <= b._4 })
    assert(got.last._4 == 9L.max(5L) + 1L + (if (9 % 5 == 0) -1 else 0))
  }

  test("a re-seen token never counts twice (first-occurrence only)") {
    // steps=3 → pcts 33/66/100 → cutoffs floor(p·3/100) = 0, 1, 3
    val docs = Seq((1L, "x x x"), (2L, "x"), (3L, "x y"))
    val got = vg(docs, steps = 3)
    assert(got.map(_._4) == Seq(0L, 1L, 2L))
    assert(got.map(_._3) == Seq(0L, 3L, 6L))
  }

  test("checkpoints before the first doc report zeros") {
    // ids 9,10 with 10 steps: cutoffs 1..8 precede every doc
    val docs = Seq((9L, "a"), (10L, "b"))
    val got = vg(docs)
    assert(got.take(8).forall(r => r._3 == 0L && r._4 == 0L))
    assert(got(8) == ((90L, 9L, 1L, 1L)))
    assert(got(9) == ((100L, 10L, 2L, 2L)))
  }

  test("partitioning invariance") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 13} w${(i * 7) % 11} filler"))
    assert(vg(docs, parts = 1) == vg(docs, parts = 11))
  }
}
