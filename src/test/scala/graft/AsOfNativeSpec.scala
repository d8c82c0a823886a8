package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoinOp, Relational}

/** Native AsOfJoinExec vs the composed union-tag formulation. */
class AsOfNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native as-of join equals the composed operator row-for-row") {
    val native = AsOfJoinOp.asofNativeQ(spark, TestSpark.sf)
      .select($"event_id", $"asof_orderkey")
      .as[(Long, Option[Long])].collect().toSeq
    val composed = Relational.asofJoin(spark, TestSpark.sf)
      .select($"event_id", $"asof_orderkey")
      .as[(Long, Option[Long])].collect().toSeq
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("no-match left rows carry null right side") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L, 100L), (1L, 7L, 101L), (9L, 1L, 102L)).toDF("rk", "rt", "payload")
    val out = AsOfJoinOp.asof(l, r, "k", "t", "rk", "rt", "payload")
      .select($"k", $"t", $"payload").as[(Long, Long, Option[Long])]
      .collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 10L, Some(101L)), (2L, 20L, None)))
  }

  test("self-as-of-join (shared lineage) resolves sides correctly") {
    // Both sides derive from the SAME DataFrame → identical exprIds
    // before the dedup pass; without re-aliasing, bindings could
    // silently read the wrong side.
    val d = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 300L)).toDF("k", "t", "tie")
    // output = left cols then right cols (same names) — rename by position
    val out = AsOfJoinOp.asof(d, d, "k", "t", "k", "t", "tie")
      .toDF("k", "t", "tie", "rk", "rt", "rtie")
    // every left row's latest right match at time <= t is itself
    val rows = out.select($"k", $"t", $"rtie").as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 300L)))
  }

  test("tolerance drops matches older than the bound") {
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val r = Seq((1L, 95L, 7L), (1L, 50L, 8L)).toDF("rk", "rt", "payload")
    val out = AsOfJoinOp.asof(l, r, "k", "t", "rk", "rt", "payload",
        toleranceMicros = 10L)
      .select($"t", $"payload").as[(Long, Option[Long])]
      .collect().toMap
    // t=100: match rt=95 (age 5 <= 10); t=200: last rt=95 is age 105 -> null
    assert(out == Map(100L -> Some(7L), 200L -> None))
  }

  test("forward direction picks the first right row at or after t") {
    val l = Seq((1L, 100L), (1L, 300L)).toDF("k", "t")
    val r = Seq((1L, 90L, 1L), (1L, 150L, 2L), (1L, 200L, 3L)).toDF("rk", "rt", "tie")
    val out = AsOfJoinOp.asofForward(l, r, "k", "t", "rk", "rt", "tie")
      .select($"t", $"tie").as[(Long, Option[Long])].collect().toMap
    // t=100 -> first rt >= 100 is 150 (tie 2); t=300 -> none
    assert(out == Map(100L -> Some(2L), 300L -> None))
  }

  test("tiebreak picks the greatest among equal (key, time)") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L)).toDF("rk", "rt", "tie")
    val out = AsOfJoinOp.asof(l, r, "k", "t", "rk", "rt", "tie")
      .select($"tie").as[Long].collect().toSeq
    assert(out == Seq(9L))
  }
}
