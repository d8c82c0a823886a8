package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BandJoin

/** Numeric band join (SURVEY.md §2 row 290): exact band semantics
  * at both edges, bucket-boundary pairs (the ±1 probe explosion),
  * no pair duplication, and equality with a brute-force theta join. */
class BandJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(ls: Seq[Long], rs: Seq[Long], eps: Long) =
    BandJoin.bandJoin(
        ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv"),
        rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv"),
        col("lv"), col("rv"), eps)
      .select($"lid", $"rid", $"diff")
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("inclusive at both edges, exclusive just past them") {
    val got = pairs(Seq(100L), Seq(90L, 110L, 89L, 111L), eps = 10)
    assert(got == Seq((0L, 0L, 10L), (0L, 1L, -10L)))
  }

  test("pairs that straddle a bucket boundary are found (the ±1 explosion)") {
    // eps=10: buckets [90..99]=9, [100..109]=10 — 99 and 100 are in-band
    // but different buckets
    val got = pairs(Seq(99L), Seq(100L), eps = 10)
    assert(got == Seq((0L, 0L, -1L)))
  }

  test("same-bucket pairs appear exactly once (no dedup pass needed)") {
    val got = pairs(Seq(101L, 105L), Seq(103L), eps = 10)
    assert(got == Seq((0L, 0L, -2L), (1L, 0L, 2L)))
  }

  test("matches a brute-force theta join on a random frame, incl. negatives") {
    val ls = (1 to 300).map(i => ((i * 37 % 211) - 100).toLong)
    val rs = (1 to 150).map(i => ((i * 53 % 223) - 110).toLong)
    val eps = 7L
    val got = pairs(ls, rs, eps)
    val want = (for {
      (l, li) <- ls.zipWithIndex
      (r, ri) <- rs.zipWithIndex
      if math.abs(l - r) <= eps
    } yield (li.toLong, ri.toLong, l - r)).sorted
    assert(got == want && want.nonEmpty)
  }
}
