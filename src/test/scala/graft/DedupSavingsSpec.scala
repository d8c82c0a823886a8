package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Dedup savings report (SURVEY.md §2 row 208): hand-computed savings
  * per cluster size, canonical = min-id member, out-of-map exclusion,
  * conservation, and partitioning invariance. */
class DedupSavingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def savings(recs: Seq[(Long, Long)], cc: Seq[(Long, Long)],
                      parts: Int = 1) =
    TextOps.dedupSavings(recs.toDF("id", "chars").repartition(parts),
        "id", "chars", cc.toDF("id", "comp"))
      .orderBy($"size")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed: one pair and one triple") {
    // cluster 1 = {1:100, 2:50}; cluster 3 = {3:10, 4:20, 5:30}
    val recs = Seq(1L -> 100L, 2L -> 50L, 3L -> 10L, 4L -> 20L, 5L -> 30L)
    val cc = Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L)
    val got = savings(recs, cc)
    // size 2: saved = 150 - 100 (keep id 1) = 50
    // size 3: saved = 60 - 10 (keep id 3) = 50
    assert(got == Seq(
      (2L, 1L, 2L, 1L, 150L, 50L),
      (3L, 1L, 3L, 2L, 60L, 50L)))
  }

  test("docs outside the component map contribute nothing") {
    val recs = Seq(1L -> 5L, 2L -> 7L, 9L -> 1000L)
    val cc = Seq(1L -> 1L, 2L -> 1L)
    val got = savings(recs, cc)
    assert(got == Seq((2L, 1L, 2L, 1L, 12L, 7L)))
  }

  test("doc and redundancy counts conserve") {
    val recs = (1L to 120L).map(i => i -> (i * 3))
    val cc = (1L to 120L).map(i => i -> ((i - 1) / 4 * 4 + 1))
    val got = savings(recs, cc)
    assert(got.map(_._3).sum == 120L)
    assert(got.map(_._4).sum == 120L - got.map(_._2).sum)
  }

  test("partitioning invariance") {
    val recs = (1L to 200L).map(i => i -> (i * 7 % 97))
    val cc = (1L to 200L).map(i => i -> (i % 30 + 1))
    assert(savings(recs, cc, parts = 1) == savings(recs, cc, parts = 13))
  }
}
