package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOverlap

/** KMV corpus-overlap algebra (SURVEY.md §2 row 255): sketch
  * determinism and dedup, the exact-when-union<k property, union
  * closure (sketch of the union == union of the sketches), and the
  * saturated-regime estimator accuracy for distinct count and
  * Jaccard. */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def row(a: Seq[Long], b: Seq[Long], k: Int = 128) =
    CorpusOverlap.overlap(a.toDF("h"), b.toDF("h"), "h", k)
      .as[(Long, Long, Long, Long, Option[Long], Long, Option[Long],
        Option[Long], Option[Long])].collect().head

  test("unsaturated union is EXACT: sizes, intersection, jaccard") {
    val a = (1L to 50L)
    val b = (30L to 80L)
    val got = row(a, b)
    // union 80 distinct < k=128 -> everything exact
    assert(got._4 == 80L)                    // union_k
    assert(got._5.isEmpty)                   // kth_hash: unsaturated
    assert(got._6 == 21L)                    // |{30..50}|
    assert(got._7.contains(80L) && got._8.contains(21L))
    assert(got._9.contains(21L * 1000000L / 80L))
  }

  test("duplicates never change a sketch; sketches are deterministic") {
    val a = Seq(5L, 1L, 3L, 5L, 5L, 1L)
    val s1 = CorpusOverlap.kmvSketch(a.toDF("h"), "h", 4)
      .as[Seq[Long]].collect().head
    assert(s1 == Seq(1L, 3L, 5L))
    val s2 = CorpusOverlap.kmvSketch(
        (a ++ a ++ a).toDF("h").repartition(7), "h", 4)
      .as[Seq[Long]].collect().head
    assert(s2 == s1)
  }

  test("union closure: bottom-k of merged sketches == sketch of the merged corpus") {
    val a = (1L to 400L).map(i => i * 7919L % 100003L)
    val b = (1L to 400L).map(i => i * 104729L % 100003L)
    val k = 64
    val direct = CorpusOverlap.kmvSketch((a ++ b).toDF("h"), "h", k)
      .as[Seq[Long]].collect().head
    val sa = CorpusOverlap.kmvSketch(a.toDF("h"), "h", k)
      .as[Seq[Long]].collect().head
    val sb = CorpusOverlap.kmvSketch(b.toDF("h"), "h", k)
      .as[Seq[Long]].collect().head
    assert((sa ++ sb).distinct.sorted.take(k) == direct)
  }

  test("saturated regime: distinct-count and jaccard estimates land near truth") {
    // 50k + 50k elements with EXACTLY 25k shared -> union 75k,
    // jaccard 1/3; hash to near-uniform longs with xxhash64
    val a = spark.range(0, 50000).select(xxhash64(col("id")).as("h"))
    val b = spark.range(25000, 75000).select(xxhash64(col("id")).as("h"))
    val got = CorpusOverlap.overlap(a, b, "h", 128)
      .as[(Long, Long, Long, Long, Option[Long], Long, Option[Long],
        Option[Long], Option[Long])].collect().head
    assert(got._2 == 128L && got._3 == 128L && got._4 == 128L)
    assert(got._7.isEmpty && got._8.isEmpty) // saturated: no exact claims
    // distinct-count estimate from the k-th normalized hash position
    // (the display double the registered row deliberately omits)
    val kth = got._5.get.toDouble + 9.223372036854775808e18
    val est = (128.0 - 1.0) * 1.8446744073709552e19 / kth
    assert(est > 75000 * 0.7 && est < 75000 * 1.3, s"union est $est")
    // jaccard 1/3 within 3 sigma (~0.125 at k=128)
    val j = got._9.get / 1e6
    assert(j > 0.333 - 0.13 && j < 0.333 + 0.13, s"jaccard $j")
  }

  test("disjoint corpora report zero intersection") {
    val got = row((1L to 200L), (1000L to 1200L), k = 64)
    assert(got._6 == 0L && got._9.contains(0L))
  }
}
