package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingOps

/** Stratified exact-quota split (SURVEY.md §2 row 193): quota
  * exactness per stratum, exhaustive/disjoint assignment, Hamilton
  * rounding, determinism, and partitioning invariance. */
class StratSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val splits = Seq("train" -> 80, "dev" -> 10, "test" -> 10)

  private def split(rows: Seq[(Long, String)], parts: Int = 1) =
    TrainingOps.stratifiedSplit(
        rows.toDF("id", "st").repartition(parts), Seq("st"), col("id"), splits)
      .as[(String, Long, String)].collect().toSeq

  test("every stratum hits its exact Hamilton quotas") {
    // stratum a: 25 rows → 80% = 20, 10% = 2.5 → floors (20,2,2)=24,
    // deficit 1 → bonus to the larger remainder (dev/test tie 50 → ord:
    // dev first) → (20,3,2)
    val rows = (1L to 25L).map((_, "a")) ++ (100L to 109L).map((_, "b"))
    val got = split(rows)
    val a = got.filter(_._1 == "a").groupBy(_._3).view.mapValues(_.size).toMap
    assert(a == Map("train" -> 20, "dev" -> 3, "test" -> 2), a.toString)
    val b = got.filter(_._1 == "b").groupBy(_._3).view.mapValues(_.size).toMap
    assert(b == Map("train" -> 8, "dev" -> 1, "test" -> 1), b.toString)
  }

  test("assignment is exhaustive and disjoint") {
    val rows = (1L to 97L).map(i => (i, s"s${i % 3}"))
    val got = split(rows)
    assert(got.size == 97)
    assert(got.map(_._2).distinct.size == 97)
  }

  test("tiny strata still tile exactly") {
    // n=1: floors (0,0,0), deficit 1 → remainder order 80,10,10 → train
    val got1 = split(Seq((1L, "solo")))
    assert(got1.map(_._3) == Seq("train"))
    // n=2 → bases (1,0,0), remainders (60,20,20): the bonus also goes
    // to train → both rows train
    val got2 = split(Seq((1L, "duo"), (2L, "duo")))
    assert(got2.map(_._3) == Seq("train", "train"))
    // n=4 → bases (3,0,0), remainders (20,40,40): bonus → dev
    val got4 = split((1L to 4L).map((_, "quad")))
    assert(got4.map(_._3).sorted == Seq("dev", "train", "train", "train"))
  }

  test("deterministic across runs") {
    val rows = (1L to 50L).map(i => (i, s"s${i % 2}"))
    assert(split(rows) == split(rows))
  }

  test("partitioning invariance") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 5}"))
    assert(split(rows, parts = 1).toSet == split(rows, parts = 13).toSet)
  }
}
