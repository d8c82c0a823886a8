package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fusion

/** Reciprocal rank fusion (§2.11). */
class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rank(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "doc_id", "rn")

  test("a doc on both lists outranks single-list docs near its ranks") {
    val sparse = rank((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
    val dense = rank((1L, 40L, 1L), (1L, 20L, 2L), (1L, 50L, 3L))
    val got = Fusion.rrfFuse(Seq(sparse, dense), topK = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    // doc 20: 1e6//62 twice = 32258; docs 10/40: 1e6//61 = 16393
    assert(got.head._2 == 20L && got.head._3 == 32258L)
    assert(got(1) == ((1L, 10L, 16393L, 2L)))  // tie vs 40 broken by doc_id
    assert(got(2) == ((1L, 40L, 16393L, 3L)))
  }

  test("fusing a single ranking preserves its order") {
    val r = rank((1L, 5L, 1L), (1L, 7L, 2L), (2L, 9L, 1L))
    val got = Fusion.rrfFuse(Seq(r), topK = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._4))
    assert(got.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq((1L, 5L, 1L), (1L, 7L, 2L), (2L, 9L, 1L)))
  }

  test("hybrid query is deterministic and query-bounded") {
    def run() = Fusion.hybridRankQ(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val a = run()
    assert(a.nonEmpty && a == run())
    // 3 queries x top-10
    assert(a.map(_._1).distinct.size == 3 && a.size <= 30)
  }
}
