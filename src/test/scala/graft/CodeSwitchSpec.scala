package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CodeSwitch

/** Code-switch segmentation (SURVEY.md §2 row 188): block labeling,
  * run merging, switch boundaries, the markerless default, and
  * partitioning invariance. */
class CodeSwitchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seg(docs: Seq[(Long, String)], blockLen: Int = 10, parts: Int = 1) =
    CodeSwitch.spans(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", blockLen)
      .orderBy($"doc_id", $"span_id")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq

  private val en = "the cat and the dog of a to in and"     // 10 en tokens
  private val es = "el la que de en y el la que y"          // 10 es tokens

  test("an english doc is one span") {
    assert(seg(Seq((1L, s"$en $en"))) ==
      Seq((1L, 1L, "en", 0L, 1L, 2L)))
  }

  test("a language switch starts a new span at the block boundary") {
    val got = seg(Seq((1L, s"$en $es $es")))
    assert(got == Seq(
      (1L, 1L, "en", 0L, 0L, 1L),
      (1L, 2L, "es", 1L, 2L, 2L)))
  }

  test("a-b-a alternation yields three spans") {
    val got = seg(Seq((1L, s"$en $es $en")))
    assert(got.map(_._3) == Seq("en", "es", "en"))
    assert(got.map(_._6) == Seq(1L, 1L, 1L))
  }

  test("a markerless block defaults to en and merges with en neighbors") {
    val neutral = "zzz yyy xxx www vvv uuu ttt sss rrr qqq"
    assert(seg(Seq((1L, s"$en $neutral"))) ==
      Seq((1L, 1L, "en", 0L, 1L, 2L)))
  }

  test("docs segment independently") {
    val got = seg(Seq((1L, en), (2L, es)))
    assert(got == Seq((1L, 1L, "en", 0L, 0L, 1L), (2L, 1L, "es", 0L, 0L, 1L)))
  }

  test("partitioning invariance on the seeded registered shape") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) s"$en $es" else s"$en $en"))
    assert(seg(docs, parts = 1) == seg(docs, parts = 13))
  }
}
