package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Deterministic random walks (SURVEY.md §2 row 305): the walk corpus
  * is a pure function of (graph, ids) — the spec replays the hash
  * argmin step by step in plain Scala and demands equality, plus the
  * structural contracts (dead ends, invariance, walk independence). */
class WalksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  //          1 -> {2, 3}; 2 -> {3, 4}; 3 -> {4}; 4 is a dead end
  private lazy val edges =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
  private val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L, 4L),
    3L -> Seq(4L), 4L -> Seq.empty[Long])

  private def hashOf(start: Long, walk: Long, step: Int, dst: Long): Long =
    graft.plans.PolyHash64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        s"walk|$start|$walk|$step|$dst"))

  private def replay(start: Long, walk: Long, length: Int): Seq[(Long, Long)] = {
    var cur = start
    (0L -> start) +: (1 to length).iterator.map { t =>
      val outs = adj(cur)
      if (outs.isEmpty) None
      else {
        val next = outs.minBy(d => (hashOf(start, walk, t, d), d))
        cur = next
        Some(t.toLong -> next)
      }
    }.takeWhile(_.isDefined).map(_.get).toSeq
  }

  test("every walk equals the scala replay of the hash argmin") {
    val got = GraphOps.deterministicWalks(edges, "src", "dst",
        walksPerNode = 3, length = 5)
      .collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(2)).map(r => (r.getLong(2), r.getLong(3))).toSeq
      }
    for (start <- 1L to 4L; walk <- 0L until 3L)
      assert(got((start, walk)) == replay(start, walk, 5), s"($start, $walk)")
  }

  test("dead ends terminate walks early; different walk indices can diverge") {
    val got = GraphOps.deterministicWalks(edges, "src", "dst",
        walksPerNode = 8, length = 6)
      .collect().groupBy(r => (r.getLong(0), r.getLong(1)))
    // from 4 (a dead end) every walk is just the start position
    for (w <- 0L until 8L) assert(got((4L, w)).length == 1)
    // from 1, with 8 walks over binary choices, at least two differ
    val paths = (0L until 8L).map(w =>
      got((1L, w)).sortBy(_.getLong(2)).map(_.getLong(3)).toSeq).distinct
    assert(paths.size >= 2, s"all 8 walks identical: $paths")
  }

  test("the corpus is invariant under input partitioning") {
    val a = GraphOps.deterministicWalks(edges, "src", "dst", 2, 4)
      .orderBy("start", "walk", "step").collect().toSeq
    val b = GraphOps.deterministicWalks(edges.repartition(7, col("dst")),
        "src", "dst", 2, 4)
      .orderBy("start", "walk", "step").collect().toSeq
    assert(a == b)
  }
}
