package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** k-core peeling (SURVEY.md §2 row 174): cascade order, core
  * membership, the rounds cap, early-exit equivalence, and
  * partitioning invariance. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int,
                   parts: Int = 1): Map[Long, Option[Long]] =
    GraphOps.kCorePeel(edges.toDF("a", "b").repartition(parts), "a", "b",
        k, rounds)
      .as[(Long, Option[Long])].collect().toMap

  private val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))

  test("chain under k=2 cascades inward, one layer per round") {
    val got = peel(chain, k = 2, rounds = 6)
    assert(got == Map(1L -> Some(1L), 5L -> Some(1L),
      2L -> Some(2L), 4L -> Some(2L), 3L -> Some(3L)))
  }

  test("cycle under k=2 survives whole (peel_round NULL)") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(peel(cyc, k = 2, rounds = 6).values.forall(_.isEmpty))
  }

  test("pendant peels; clique absorbs the degree loss and survives") {
    // K4 on 1..4 plus pendant 5-1: node 1 has raw degree 4 >= 3, but
    // only its CORE degree (3, after 5 peels) is what k=3 tests
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = peel(k4 :+ (5L, 1L), k = 3, rounds = 6)
    assert(got(5L) == Some(1L))
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_).isEmpty))
  }

  test("rounds cap truncates the cascade; survivors report NULL") {
    val got = peel(chain, k = 2, rounds = 1)
    assert(got == Map(1L -> Some(1L), 5L -> Some(1L),
      2L -> None, 3L -> None, 4L -> None))
  }

  test("rounds=0 is the spine with no peeling") {
    assert(peel(chain, k = 2, rounds = 0).values.forall(_.isEmpty))
  }

  test("early exit: extra rounds after fixpoint change nothing") {
    val g = chain ++ Seq((10L, 11L), (11L, 12L), (12L, 10L))
    assert(peel(g, k = 2, rounds = 3) == peel(g, k = 2, rounds = 20))
  }

  test("self-loops and duplicate/reversed edges are canonicalized away") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L))
    // simple path 1-2-3 under k=2: endpoints then the middle
    val got = peel(g, k = 2, rounds = 6)
    assert(got == Map(1L -> Some(1L), 3L -> Some(1L), 2L -> Some(2L)))
  }

  test("partitioning invariance on the purchase graph") {
    val e = GraphOps.purchaseEdges(spark, TestSpark.sf)
    val a = GraphOps.kCorePeel(e, "ca", "sb", k = 48, rounds = 6)
      .as[(Long, Option[Long])].collect().toMap
    val b = GraphOps.kCorePeel(e.repartition(17), "ca", "sb", k = 48, rounds = 6)
      .as[(Long, Option[Long])].collect().toMap
    assert(a == b && a.nonEmpty)
    assert(a.values.exists(_.nonEmpty), "expected some peeling at test SF")
  }
}
