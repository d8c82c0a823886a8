package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Weighted integer PageRank (SURVEY.md §2 row 114): mass
  * conservation, symmetry, dangling-mass redistribution, determinism
  * under repartitioning, and the positive-weight contract. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  test("total rank mass is conserved up to floor truncation") {
    val e = GraphOps.nationFlowEdges(spark, TestSpark.sf)
    val total = GraphOps.pageRank(e, "src", "dst", "w", iters = 3)
      .agg(sum($"rank")).head().getLong(0)
    assert(math.abs(total - Scale) < Scale / 1000L, s"total=$total")
  }

  test("a symmetric ring yields equal ranks") {
    val e = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L)).toDF("src", "dst", "w")
    val ranks = GraphOps.pageRank(e, "src", "dst", "w", iters = 4)
      .orderBy($"node").as[(Long, Long)].collect()
    assert(ranks.map(_._2).distinct.length == 1, ranks.mkString(","))
  }

  test("dangling node: mass flows in, redistributes back out uniformly") {
    // 1 -> 2; node 2 has no out-edges
    val e = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val r = GraphOps.pageRank(e, "src", "dst", "w", iters = 3)
      .orderBy($"node").as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 2L))
    // node 2 receives everything node 1 passes plus its dangling share:
    // it must strictly out-rank node 1, and no mass may vanish
    assert(r(2L) > r(1L), r.toString)
    assert(math.abs(r.values.sum - Scale) < Scale / 1000L, r.toString)
  }

  test("ranks are invariant to edge partitioning") {
    val e = GraphOps.nationFlowEdges(spark, TestSpark.sf)
    val a = GraphOps.pageRank(e, "src", "dst", "w", iters = 2)
      .orderBy($"node").collect().toSeq
    val b = GraphOps.pageRank(e.repartition(13, $"dst"), "src", "dst", "w", iters = 2)
      .orderBy($"node").collect().toSeq
    assert(a == b)
  }

  test("non-positive edge weights are rejected") {
    val e = Seq((1L, 2L, 0L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      GraphOps.pageRank(e, "src", "dst", "w", iters = 1).collect()
    }
    assert(ex.getMessage.contains("positive") ||
      ex.getCause != null && ex.getCause.getMessage.contains("positive"), ex.getMessage)
  }

  test("nation-flow edge derivation broadcasts the dims") {
    val p = GraphOps.nationFlowEdges(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
