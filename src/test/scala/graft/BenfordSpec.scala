package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dq

/** Benford first-digit audit (SURVEY.md §2 row 203): the ppm constant
  * table, leading-digit extraction, non-positive exclusion, zero-digit
  * reporting, the zero-sum deviation identity, and partitioning
  * invariance. */
class BenfordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bf(vs: Seq[Long], parts: Int = 1) =
    Dq.benfordAudit(vs.toDF("v").repartition(parts), col("v"))
      .orderBy($"digit")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("the ppm constants sum to exactly one million") {
    assert(Dq.BenfordPpm.sum == 1000000L && Dq.BenfordPpm.size == 9)
  }

  test("leading digits count correctly across magnitudes") {
    val got = bf(Seq(1L, 19L, 123L, 2L, 900L, 95L))
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
        6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 2L))
  }

  test("zero and negative values are excluded; all nine digits report") {
    val got = bf(Seq(0L, -5L, 7L))
    assert(got.size == 9 && got.map(_._2).sum == 1L && got.forall(_._6 == 1L))
  }

  test("deviation numerators sum to zero") {
    val got = bf((1L to 500L).map(i => (i * 7919L) % 10007L).filter(_ > 0))
    assert(got.map(_._5).sum == 0L)
  }

  test("a perfectly Benford-weighted sample deviates zero on every digit") {
    // n_d = ppm_d exactly (N = 1e6 scaled down: use ppm as counts)
    val vs = Dq.BenfordPpm.zipWithIndex.flatMap { case (p, i) =>
      Seq.fill((p / 1000L).toInt)((i + 1).toLong) }
    val got = bf(vs)
    // counts are ppm//10000 so not exactly proportional — check the
    // observed ppm is within one part-per-thousand of the constant
    got.foreach(r => assert(math.abs(r._3 - r._4) < 2000L, r.toString))
  }

  test("partitioning invariance") {
    val vs = (1L to 400L).map(i => (i * 37L) % 977L).filter(_ > 0)
    assert(bf(vs, parts = 1) == bf(vs, parts = 13))
  }
}
