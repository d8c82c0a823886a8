package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fuzzy

/** Sorted-neighborhood blocking (SURVEY.md §2 row 196): window pair
  * construction, first-char bucket isolation, the edit-distance
  * verify, reverse-pass recall, canonical orientation, and
  * partitioning invariance. */
class SnmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snm(rows: Seq[(Long, String)], keys: Seq[org.apache.spark.sql.Column],
                  w: Int, maxDist: Int, parts: Int = 1) =
    Fuzzy.snmCandidates(rows.toDF("id", "s").repartition(parts),
        col("id"), keys, w, maxDist)
      .orderBy($"pass", $"id_a", $"id_b")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("window w pairs each record with its next w-1 sort neighbors") {
    // sort order: aa1(1) aa2(2) aa3(3) aa4(4); w=3 → (r, r+1), (r, r+2)
    val rows = Seq(2L -> "aa2", 4L -> "aa4", 1L -> "aa1", 3L -> "aa3")
    val got = snm(rows, Seq(col("s")), w = 3, maxDist = 10)
    assert(got.map(r => (r._2, r._3)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("pairs never cross the first-character bucket") {
    val rows = Seq(1L -> "aa", 2L -> "ab", 3L -> "ba", 4L -> "bb")
    val got = snm(rows, Seq(col("s")), w = 4, maxDist = 10)
    assert(got.map(r => (r._2, r._3)).toSet == Set((1L, 2L), (3L, 4L)))
  }

  test("edit-distance verify drops lexically-adjacent but distant keys") {
    val rows = Seq(1L -> "a", 2L -> "a very much longer key")
    assert(snm(rows, Seq(col("s")), w = 2, maxDist = 3).isEmpty)
    assert(snm(rows, Seq(col("s")), w = 2, maxDist = 30).size == 1)
  }

  test("the reversed-key pass catches first-char divergence") {
    // '1 suffix' vs '2 suffix': pass 1 buckets split on '1'/'2';
    // reversed keys both start 'x' and are adjacent → pass 2 only
    val rows = Seq(1L -> "1 suffix", 2L -> "2 suffix")
    val got = snm(rows, Seq(col("s"), reverse(col("s"))), w = 2, maxDist = 2)
    assert(got == Seq((2L, 1L, 2L, 1L)))
  }

  test("pairs are canonically oriented regardless of sort position") {
    val rows = Seq(9L -> "aa1", 1L -> "aa2")
    val got = snm(rows, Seq(col("s")), w = 2, maxDist = 5)
    assert(got.map(r => (r._2, r._3)) == Seq((1L, 9L)))
  }

  test("partitioning invariance") {
    val rows = (1L to 300L).map(i => i -> s"key ${(i * 37) % 50} tail ${i % 7}")
    val keys = Seq(col("s"), reverse(col("s")))
    assert(snm(rows, keys, 4, 8, parts = 1) == snm(rows, keys, 4, 8, parts = 13))
  }
}
