package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Exact equi-depth histogram (SURVEY.md §2 row 201): uniform split,
  * heavy-value distortion reporting, NULL exclusion, conservation,
  * sparse buckets under few distincts, and partitioning invariance. */
class EquiDepthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hist(vs: Seq[Option[Long]], b: Int, parts: Int = 1) =
    Profiling.equiDepthHistogram(vs.toDF("v").repartition(parts), col("v"), b)
      .orderBy($"bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("uniform values split into equal-depth buckets") {
    val got = hist((1L to 10L).map(Some(_)), b = 2)
    assert(got == Seq((0L, 1L, 5L, 5L, 5L), (1L, 6L, 10L, 5L, 5L)))
  }

  test("a heavy value inflates its bucket and the report shows it") {
    // 1×1, 2×8, 3×1: n=10, B=2 — value 2 ends at cum 9 → bucket
    // (9-1)*2//10 = 1; bucket 0 holds only value 1
    val vs = Some(1L) +: Seq.fill(8)(Some(2L)) :+ Some(3L)
    val got = hist(vs, b = 2)
    assert(got == Seq((0L, 1L, 1L, 1L, 1L), (1L, 2L, 3L, 9L, 2L)))
  }

  test("NULLs hold no rank") {
    val got = hist(Seq(Some(1L), None, Some(2L), None), b = 1)
    assert(got == Seq((0L, 1L, 2L, 2L, 2L)))
  }

  test("row and distinct counts conserve across buckets") {
    val vs = (1L to 97L).map(i => Some((i * 13) % 31))
    val got = hist(vs, b = 7)
    assert(got.map(_._4).sum == 97L)
    assert(got.map(_._5).sum == vs.flatten.distinct.size.toLong)
  }

  test("fewer distinct values than buckets leaves gaps, not empties") {
    val got = hist(Seq(Some(5L), Some(9L)), b = 4)
    // cum 1 → bucket 0, cum 2 → bucket (1*4)//2 = 2
    assert(got == Seq((0L, 5L, 5L, 1L, 1L), (2L, 9L, 9L, 1L, 1L)))
  }

  test("partitioning invariance") {
    val vs = (1L to 500L).map(i => Some((i * 7919L) % 113L))
    assert(hist(vs, 10, parts = 1) == hist(vs, 10, parts = 13))
  }
}
