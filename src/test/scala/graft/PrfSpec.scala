package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps2

/** PRF query expansion (SURVEY.md §2 row 190): feedback-set scoping,
  * query-term exclusion, score arithmetic, the top-m cut, and
  * partitioning invariance. */
class PrfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def prf(docs: Seq[(Long, String)], qs: Seq[(Long, String)],
                  k: Int, m: Int, parts: Int = 1) = {
    val df = docs.toDF("doc_id", "text").repartition(parts)
    val (p, st) = TextOps2.buildBm25Postings(df, col("doc_id"), col("text"))
    TextOps2.prfExpansion(spark, p, st, qs, k, m)
      .orderBy($"qid", $"rn")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
  }

  private val docs = Seq(
    (1L, "scan filter filter pushdown"),
    (2L, "scan filter projection"),
    (3L, "totally unrelated cooking recipe"),
    (4L, "scan vectorized reader"))

  test("expansion terms come from the feedback docs, query terms excluded") {
    val got = prf(docs, Seq((1L, "scan")), k = 3, m = 10)
    assert(got.nonEmpty)
    assert(!got.exists(_._2 == "scan"), "the query's own term is excluded")
    assert(!got.exists(_._2 == "cooking"),
      "doc 3 never matches 'scan' → not feedback")
    val filter = got.find(_._2 == "filter").get
    assert(filter._3 == 3L && filter._4 == 2L,
      "score = Σtf over feedback (2+1), df_fb = 2 docs")
  }

  test("top term is the highest summed tf; rn orders (score DESC, term)") {
    val got = prf(docs, Seq((1L, "scan")), k = 3, m = 2)
    assert(got.head._2 == "filter" && got.head._5 == 1L)
    assert(got.size == 2, "m truncates")
  }

  test("queries expand independently") {
    val got = prf(docs, Seq((1L, "scan"), (2L, "cooking")), k = 3, m = 10)
    val q2 = got.filter(_._1 == 2L).map(_._2).toSet
    assert(q2 == Set("totally", "unrelated", "recipe"))
  }

  test("partitioning invariance") {
    val many = (1L to 60L).map(i => (i, s"scan w${i % 7} filter w${i % 5}"))
    assert(prf(many, TextOps2.Bm25Queries, 10, 5, parts = 1) ==
      prf(many, TextOps2.Bm25Queries, 10, 5, parts = 13))
  }
}
