package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Exact per-group quantile bands (SURVEY.md §2 row 223): the textbook
  * lower-quantile picks, tie handling, group isolation, the singleton
  * group, NULL exclusion, and partitioning invariance. */
class QuantileBandsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bands(rows: Seq[(String, Option[Long])], cuts: Seq[Int],
                    parts: Int = 1) =
    Profiling.quantileBands(rows.toDF("g", "v").repartition(parts),
        col("g"), col("v"), cuts)
      .orderBy($"g", $"q")
      .as[(String, Long, Long, Long)].collect().toSeq

  test("textbook lower-quantile picks on 1..10") {
    val rows = (1L to 10L).map(v => ("a", Some(v)))
    val got = bands(rows, Seq(25, 50, 75))
    // min v with cum·100 >= q·10: q25 → cum ≥ 2.5 → v=3; q50 → 5; q75 → 8
    assert(got == Seq(("a", 25L, 3L, 10L), ("a", 50L, 5L, 10L), ("a", 75L, 8L, 10L)))
  }

  test("heavy ties collapse the band onto the tied value") {
    val rows = (Seq.fill(8)(5L) ++ Seq(1L, 9L)).map(v => ("a", Some(v)))
    val got = bands(rows, Seq(25, 50, 75))
    assert(got.map(_._3) == Seq(5L, 5L, 5L))
  }

  test("groups are isolated; a singleton group answers itself everywhere") {
    val rows = (1L to 10L).map(v => ("a", Some(v))) :+ (("b", Some(42L)))
    val got = bands(rows, Seq(50))
    assert(got == Seq(("a", 50L, 5L, 10L), ("b", 50L, 42L, 1L)))
  }

  test("p100 is the maximum; NULLs hold no rank") {
    val rows = Seq(("a", Some(1L)), ("a", Some(7L)), ("a", None))
    val got = bands(rows, Seq(100))
    assert(got == Seq(("a", 100L, 7L, 2L)))
  }

  test("partitioning invariance") {
    val rows = (1L to 400L).map(i => (s"g${i % 5}", Some((i * 37L) % 97L)))
    assert(bands(rows, Seq(25, 50, 75), parts = 1) ==
      bands(rows, Seq(25, 50, 75), parts = 13))
  }
}
