package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Partition-skew audit (SURVEY.md §2 row 185): bucket totals,
  * celebrity-key detection, weight accounting, NULL weights, and
  * partitioning invariance. */
class SkewAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def audit(rows: Seq[(String, Long)], buckets: Int, parts: Int = 1) =
    Profiling.partitionSkewAudit(
        rows.toDF("k", "w").repartition(parts), col("k"), col("w"), buckets)
      .orderBy($"bucket")
      .as[(Long, Long, Long, Long, String, Long)].collect().toSeq

  test("bucket totals conserve rows and weight") {
    val rows = (1 to 100).map(i => (s"k${i % 10}", i.toLong))
    val got = audit(rows, buckets = 4)
    assert(got.map(_._2).sum == 100L)
    assert(got.map(_._4).sum == (1 to 100).map(_.toLong).sum)
    assert(got.map(_._3).sum == 10L, "each key lands in exactly one bucket")
  }

  test("a celebrity key surfaces as its bucket's top key") {
    val rows = Seq.fill(50)(("whale", 2L)) ++
      (1 to 10).map(i => (s"small$i", 1L))
    val got = audit(rows, buckets = 2)
    val whaleBucket = got.find(_._5 == "whale").get
    assert(whaleBucket._6 == 50L)
    assert(whaleBucket._2 >= 50L)
  }

  test("single bucket degenerates to the global profile") {
    val rows = Seq(("a", 1L), ("b", 2L), ("a", 3L))
    val got = audit(rows, buckets = 1)
    assert(got == Seq((0L, 3L, 2L, 6L, "a", 2L)))
  }

  test("top-key tie breaks by key descending (the argmax struct order)") {
    val rows = Seq(("x", 1L), ("y", 1L))
    val got = audit(rows, buckets = 1)
    assert(got.head._5 == "y")
  }

  test("NULL weights count as zero, rows still counted") {
    val df = Seq(("a", Some(5L)), ("a", None)).toDF("k", "w")
    val got = Profiling.partitionSkewAudit(df, col("k"), col("w"), 1)
      .as[(Long, Long, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1L, 5L, "a", 2L)))
  }

  test("partitioning invariance") {
    val rows = (1 to 200).map(i => (s"k${i % 17}", (i * 3 % 7).toLong))
    assert(audit(rows, 8, parts = 1) == audit(rows, 8, parts = 13))
  }
}
