package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}

/** Cluster-density audit (SURVEY.md §2 row 211): the chain vs clique
  * separation, the size-2 degenerate, duplicate-edge hygiene, and
  * partitioning invariance. */
class ClusterDensitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def density(pairs: Seq[(Long, Long)], parts: Int = 1) = {
    val p = pairs.toDF("id_a", "id_b").repartition(parts)
    val cc = Dedup.connectedComponents(p, "id_a", "id_b")
    TextOps.clusterDensity(p, "id_a", "id_b", cc)
      .orderBy($"comp")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
  }

  test("a 4-chain is a tree, a 4-clique is a clique") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val clique = Seq(11L -> 12L, 11L -> 13L, 11L -> 14L,
      12L -> 13L, 12L -> 14L, 13L -> 14L)
    val got = density(chain ++ clique)
    assert(got == Seq(
      (1L, 4L, 3L, 6L, 12L, true, false),
      (11L, 4L, 6L, 12L, 12L, false, true)))
  }

  test("a size-2 cluster is both tree and clique — the honest degenerate") {
    val got = density(Seq(5L -> 6L))
    assert(got == Seq((5L, 2L, 1L, 2L, 2L, true, true)))
  }

  test("duplicate pair rows count one edge") {
    val got = density(Seq(1L -> 2L, 1L -> 2L, 2L -> 3L))
    assert(got.head._3 == 2L)
  }

  test("a triangle plus a tail is neither tree nor clique") {
    val got = density(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L))
    assert(got == Seq((1L, 4L, 4L, 8L, 12L, false, false)))
  }

  test("partitioning invariance") {
    val pairs = (1L to 200L).flatMap(i =>
      if (i % 3 == 0) Seq(i -> (i + 1)) else Seq(i -> (i + 2)))
    assert(density(pairs, parts = 1) == density(pairs, parts = 13))
  }
}
