package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Weighted multiset Jaccard (SURVEY.md §2 row 175): the min/max
  * identity, repetition sensitivity set Jaccard lacks, pair-spine
  * preservation, edge cases, and partitioning invariance. */
class WeightedJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wj(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)],
                 parts: Int = 1): Map[(Long, Long), (Long, Long)] =
    TextOps.weightedJaccard(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
        pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, d) => (a, b) -> (n, d) }.toMap

  test("hand-computed multiset example") {
    // "a a a b" vs "a b b": min(3,1)+min(1,2)=2; den=4+3-2=5
    val got = wj(Seq((1L, "a a a b"), (2L, "a b b")), Seq((1L, 2L)))
    assert(got((1L, 2L)) == ((2L, 5L)))
  }

  test("repetition separates docs set Jaccard scores identical") {
    val got = wj(Seq((1L, "a b"), (2L, "a a a a b"), (3L, "a b")),
      Seq((1L, 2L), (1L, 3L)))
    assert(got((1L, 3L)) == ((2L, 2L)), "identical multisets -> num == den")
    assert(got((1L, 2L)) == ((2L, 5L)), "same vocab, different counts -> < 1")
  }

  test("identical docs score num == den") {
    val t = "x y z x"
    val got = wj(Seq((1L, t), (2L, t)), Seq((1L, 2L)))
    val (n, d) = got((1L, 2L))
    assert(n == d && d == 4L)
  }

  test("disjoint vocab pair stays on the spine with num = 0") {
    val got = wj(Seq((1L, "a b"), (2L, "c d")), Seq((1L, 2L)))
    assert(got((1L, 2L)) == ((0L, 4L)))
  }

  test("token-free doc contributes length 0, never drops the pair") {
    val got = wj(Seq((1L, "a b"), (2L, "!!! ...")), Seq((1L, 2L)))
    assert(got((1L, 2L)) == ((0L, 2L)))
  }

  test("tokenizer is the row-44 word pattern: punctuation ignored, case kept") {
    val got = wj(Seq((1L, "Foo, bar!"), (2L, "foo bar")), Seq((1L, 2L)))
    // "Foo" != "foo": only "bar" is shared
    assert(got((1L, 2L)) == ((1L, 3L)))
  }

  test("partitioning invariance on the registered composition") {
    val docs = (1L to 40L).map(i => (i, s"w${i % 4} w${i % 4} shared text body " * 3))
    val pairs = for (i <- 1L to 39L) yield (i, i + 1)
    assert(wj(docs, pairs, parts = 1) == wj(docs, pairs, parts = 9))
  }
}
