package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Quantile normalization (SURVEY.md §2 row 215): the single-source
  * identity, a hand-computed two-source mapping, rank monotonicity,
  * the singleton-source maximum, NULL exclusion, and partitioning
  * invariance. */
class QuantileNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def qn(rows: Seq[(String, Long, Option[Long])], parts: Int = 1) =
    Curation.quantileNormalize(
        rows.toDF("g", "id", "v").repartition(parts),
        col("g"), col("v"), col("id"))
      .orderBy($"id")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq

  test("a single source maps every value to itself") {
    val rows = (1L to 50L).map(i => ("a", i, Some((i * 37) % 23)))
    val got = qn(rows)
    assert(got.forall(r => r._3 == r._6))
  }

  test("hand-computed two-source mapping") {
    // source a = {10, 20}, source b = {100}; pooled sorted = 10,20,100
    // a rank1/2: ceil-depth 3/2 → cum ≥ 1.5 → first v with gcum·2 ≥ 3
    //   gcum(10)=1 → 2 < 3; gcum(20)=2 → 4 ≥ 3 → 20
    // a rank2/2: gcum·2 ≥ 6 → gcum=3 → 100
    // b rank1/1: gcum·1 ≥ 3 → 100
    val rows = Seq(("a", 1L, Some(10L)), ("a", 2L, Some(20L)), ("b", 3L, Some(100L)))
    val got = qn(rows)
    assert(got == Seq(
      (1L, "a", 10L, 1L, 2L, 20L),
      (2L, "a", 20L, 2L, 2L, 100L),
      (3L, "b", 100L, 1L, 1L, 100L)))
  }

  test("normalized values are monotone in within-source rank") {
    val rows = (1L to 60L).map(i =>
      (s"s${i % 3}", i, Some((i * 7919) % 101)))
    val got = qn(rows)
    got.groupBy(_._2).foreach { case (_, g) =>
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._6) == byRank.map(_._6).sorted)
    }
  }

  test("NULL values are excluded") {
    val rows = Seq(("a", 1L, Some(5L)), ("a", 2L, None))
    assert(qn(rows).map(_._1) == Seq(1L))
  }

  test("partitioning invariance") {
    val rows = (1L to 300L).map(i => (s"s${i % 4}", i, Some((i * 13) % 47)))
    assert(qn(rows, parts = 1) == qn(rows, parts = 13))
  }
}
