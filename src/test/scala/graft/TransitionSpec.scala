package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Markov transition audit (SURVEY.md §2 row 209): hand-traced counts,
  * user-boundary isolation, terminal-event exclusion, per-state
  * probability conservation, the modal tie-break, and partitioning
  * invariance. */
class TransitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tm(rows: Seq[(Long, Long, Long, String)], parts: Int = 1) =
    Analytics.transitionMatrix(
        rows.map { case (e, u, t, ty) => (e, u, new Timestamp(t * 1000L), ty) }
          .toDF("event_id", "user_id", "ts", "event_type").repartition(parts),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .orderBy($"from_type", $"to_type")
      .as[(String, String, Long, Long, Double, Boolean)].collect().toSeq

  test("hand-traced two-user stream") {
    // user 1: a→b→a ; user 2: a→b — transitions: a>b ×2, b>a ×1
    val rows = Seq((1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "a"),
      (4L, 2L, 10L, "a"), (5L, 2L, 20L, "b"))
    val got = tm(rows)
    assert(got == Seq(
      ("a", "b", 2L, 2L, 1d, true),
      ("b", "a", 1L, 1L, 1d, true)))
  }

  test("transitions never cross users; terminal events are excluded") {
    // user 1 ends with 'x', user 2 begins with 'y' — no x>y edge
    val rows = Seq((1L, 1L, 10L, "a"), (2L, 1L, 20L, "x"),
      (3L, 2L, 30L, "y"), (4L, 2L, 40L, "a"))
    val got = tm(rows)
    assert(got.map(r => (r._1, r._2)).toSet == Set("a" -> "x", "y" -> "a"))
  }

  test("per-state counts sum to the from-total; exactly one modal successor") {
    val rows = (1L to 300L).map(i =>
      (i, i % 7, i * 10, s"t${(i * i) % 4}"))
    val got = tm(rows)
    got.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sum == g.head._4)
      assert(g.count(_._6) == 1)
    }
  }

  test("modal ties break to the smallest successor") {
    // from 'a': one each to 'c' and 'b' → top is 'b'
    val rows = Seq((1L, 1L, 10L, "a"), (2L, 1L, 20L, "c"),
      (3L, 2L, 10L, "a"), (4L, 2L, 20L, "b"))
    val got = tm(rows)
    assert(got.filter(_._6).map(_._2) == Seq("b"))
  }

  test("partitioning invariance") {
    val rows = (1L to 400L).map(i => (i, i % 11, i * 3, s"e${(i * 13) % 5}"))
    assert(tm(rows, parts = 1) == tm(rows, parts = 13))
  }
}
