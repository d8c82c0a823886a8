package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps2

/** ARI readability (SURVEY.md §2 row 218): a hand-computed fraction
  * against the textbook formula, sentence counting, the S=1
  * punctuation-less fallback, the W=0 NULL, and partitioning
  * invariance. */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ari(texts: Seq[(Long, String)], parts: Int = 1) =
    TextOps2.readability(texts.toDF("doc_id", "text").repartition(parts),
        col("doc_id"), col("text"))
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq

  test("hand-computed fraction matches the textbook formula") {
    // "The cat sat. A dog ran!" → C=16, W=6, S=2
    val got = ari(Seq(1L -> "The cat sat. A dog ran!")).head
    assert((got._2, got._3, got._4) == ((16L, 6L, 2L)))
    assert(got._5 == 471 * 16 * 2 + 50 * 36 - 2143 * 6 * 2)
    assert(got._6 == 100 * 6 * 2)
    val textbook = 4.71 * 16.0 / 6.0 + 0.5 * 6.0 / 2.0 - 21.43
    assert(math.abs(got._7.get - textbook) < 1e-9)
  }

  test("consecutive terminators count one sentence break") {
    val got = ari(Seq(1L -> "Stop!!! Now?!")).head
    assert(got._4 == 2L)
  }

  test("punctuation-less text counts as one sentence, not NULL") {
    val got = ari(Seq(1L -> "just a fragment of words")).head
    assert(got._4 == 1L && got._7.isDefined)
  }

  test("a wordless document scores NULL") {
    val got = ari(Seq(1L -> "?!... --- ...")).head
    assert(got._3 == 0L && got._7.isEmpty)
  }

  test("partitioning invariance") {
    val texts = (1L to 300L).map(i => i -> s"word ${"x" * (i % 9).toInt}. tail${i % 5}!")
    assert(ari(texts, parts = 1) == ari(texts, parts = 13))
  }
}
