package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Golden-record survivorship (SURVEY.md §2 row 197): majority vote
  * per field, the smallest-value tie-break, NULL-vote exclusion,
  * zero-vote field omission, disagreement counting, and partitioning
  * invariance. */
class GoldenRecordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def golden(recs: Seq[(Long, Option[String], Option[String])],
                     cc: Seq[(Long, Long)], parts: Int = 1) =
    TextOps.goldenRecords(
        recs.toDF("id", "f1", "f2").repartition(parts),
        "id", cc.toDF("id", "comp"), Seq("f1", "f2"))
      .orderBy($"comp", $"field", $"value")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq

  private val cluster = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L)

  test("majority value survives with its support count") {
    val got = golden(Seq(
      (1L, Some("en"), Some("web")),
      (2L, Some("en"), Some("web")),
      (3L, Some("de"), Some("pdf"))), cluster)
    assert(got == Seq(
      (1L, "f1", "en", 2L, 2L, 3L),
      (1L, "f2", "web", 2L, 2L, 3L)))
  }

  test("frequency ties break to the smallest value") {
    val got = golden(Seq(
      (1L, Some("b"), None), (2L, Some("a"), None), (3L, None, None)), cluster)
    assert(got == Seq((1L, "f1", "a", 1L, 2L, 3L)))
  }

  test("NULLs do not vote: one non-NULL beats two NULLs") {
    val got = golden(Seq(
      (1L, None, Some("x")), (2L, None, Some("x")), (3L, Some("z"), Some("y"))), cluster)
    assert(got == Seq(
      (1L, "f1", "z", 1L, 1L, 3L),
      (1L, "f2", "x", 2L, 2L, 3L)))
  }

  test("a field with zero non-NULL votes emits no row") {
    val got = golden(Seq((1L, None, Some("x")), (2L, None, Some("x")),
      (3L, None, Some("x"))), cluster)
    assert(got.map(_._2) == Seq("f2"))
  }

  test("records outside the component map contribute nothing") {
    val got = golden(Seq(
      (1L, Some("en"), None), (2L, Some("en"), None),
      (9L, Some("xx"), Some("xx"))), Seq(1L -> 1L, 2L -> 1L))
    assert(got == Seq((1L, "f1", "en", 2L, 1L, 2L)))
  }

  test("partitioning invariance") {
    val recs = (1L to 300L).map(i =>
      (i, Some(s"v${(i * 7) % 5}"), if (i % 4 == 0) None else Some(s"w${i % 3}")))
    val cc = (1L to 300L).map(i => i -> (i % 20))
    assert(golden(recs, cc, parts = 1) == golden(recs, cc, parts = 13))
  }
}
