package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Mutual-kNN margin pairs (SURVEY.md §2 row 186): mutuality is
  * strictly stronger than one-sided top-k, hub exclusion, margin
  * arithmetic, small-rim counts, block isolation, and partitioning
  * invariance. */
class MutualKnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(vecs: Seq[(Long, Seq[Float], Int)], k: Int, parts: Int = 1) =
    VectorOps.mutualKnnMargin(
        vecs.toDF("vec_id", "embedding", "label").repartition(parts),
        "vec_id", "embedding", "label", k)
      .orderBy($"block", $"id_a", $"id_b")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq

  test("a tight pair is mutual; a one-sided attraction is not") {
    // two tight clusters {1,2} and {3,4}; 5 points at 3, but 3's
    // single (k=1) neighbor is 4 — so (3,5) is one-sided and dropped
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.99f, 0.01f), 0),
      (3L, Seq(0f, 1f), 0), (4L, Seq(0.01f, 0.99f), 0),
      (5L, Seq(0.6f, 0.8f), 0))
    val got = mk(vecs, k = 1)
    assert(got.map(r => (r._2, r._3)) == Seq((1L, 2L), (3L, 4L)),
      got.toString)
  }

  test("margin integer pair: identical pair in a 2-vector block") {
    val vecs = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0))
    val got = mk(vecs, k = 3)
    // each side has exactly ONE neighbor: isum = icos, cnt = 1
    val (_, a, b, icos, num, den) = got.head
    assert((a, b) == ((1L, 2L)))
    assert(num == icos * 2 && den == icos * 2,
      "margin = 1 exactly for a mutually-exclusive pair")
  }

  test("blocks never mix") {
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 1))
    assert(mk(vecs, k = 3) == Seq.empty)
  }

  test("k bounds each side's edge list") {
    // a hub cluster: 5 identical vectors; with k=2 each node keeps 2
    // neighbors → mutual pairs only among reciprocal picks
    val vecs = (1L to 5L).map(i => (i, Seq(1f, 0f), 0))
    val got = mk(vecs, k = 2)
    // node i's top-2 by (icos tie, dst asc) = the two smallest OTHER ids
    // → edges 1->{2,3}, 2->{1,3}, 3->{1,2}, 4->{1,2}, 5->{1,2}
    // mutual: (1,2), (1,3), (2,3)
    assert(got.map(r => (r._2, r._3)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("partitioning invariance on the real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val a = VectorOps.mutualKnnMargin(e, "vec_id", "embedding", "label", 3)
      .collect().map(_.toString).sorted.toSeq
    val b = VectorOps.mutualKnnMargin(e.repartition(17), "vec_id", "embedding", "label", 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
