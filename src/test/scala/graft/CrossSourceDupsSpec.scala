package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Cross-source duplication matrix (SURVEY.md §2 row 220): unordered
  * cell accumulation, the diagonal, pair conservation, and
  * partitioning invariance. */
class CrossSourceDupsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def matrix(pairs: Seq[(Long, Long)], docs: Seq[(Long, String)],
                     parts: Int = 1) =
    TextOps.crossSourceDups(
        pairs.toDF("id_a", "id_b").repartition(parts), "id_a", "id_b",
        docs.toDF("doc_id", "source"), "doc_id", "source")
      .orderBy($"source_a", $"source_b")
      .as[(String, String, Long)].collect().toSeq

  private val docs = Seq(1L -> "web", 2L -> "web", 3L -> "pdf", 4L -> "pdf",
    5L -> "wiki")

  test("both directions land in one unordered cell") {
    val got = matrix(Seq(1L -> 3L, 4L -> 2L), docs)
    assert(got == Seq(("pdf", "web", 2L)))
  }

  test("within-source pairs land on the diagonal") {
    val got = matrix(Seq(1L -> 2L, 3L -> 4L, 1L -> 5L), docs)
    assert(got == Seq(
      ("pdf", "pdf", 1L), ("web", "web", 1L), ("web", "wiki", 1L)))
  }

  test("every input pair lands in exactly one cell") {
    val pairs = (1L to 4L).flatMap(a => ((a + 1) to 5L).map(a -> _))
    val got = matrix(pairs, docs)
    assert(got.map(_._3).sum == pairs.size.toLong)
  }

  test("partitioning invariance") {
    val manyDocs = (1L to 100L).map(i => i -> s"s${i % 6}")
    val pairs = (1L to 99L).map(i => i -> (i + 1))
    assert(matrix(pairs, manyDocs, parts = 1) == matrix(pairs, manyDocs, parts = 13))
  }
}
