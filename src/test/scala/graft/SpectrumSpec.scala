package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Frequency spectrum (SURVEY.md §2 row 214): hand-computed spectrum,
  * the mass conservation identity Σ r·n_r = N, tokenizer folding, and
  * partitioning invariance. */
class SpectrumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spec(texts: Seq[String], parts: Int = 1) =
    CorpusOps.frequencySpectrum(texts.toDF("text").repartition(parts), col("text"))
      .orderBy($"r")
      .as[(Long, Long, Long)].collect().toSeq

  test("hand-computed spectrum") {
    // tokens: a a a b b c → r=1:{c}, r=2:{b}, r=3:{a}
    val got = spec(Seq("a a a b", "b c"))
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)))
  }

  test("mass conserves to the total token count") {
    val texts = (1 to 100).map(i => s"w${i % 13} w${i % 7} common x${i % 29}")
    val got = spec(texts)
    val n = texts.map(_.split(" ").length.toLong).sum
    assert(got.map(_._3).sum == n)
  }

  test("tokenizer folds case and punctuation") {
    val got = spec(Seq("Foo foo, FOO!"))
    assert(got == Seq((3L, 1L, 3L)))
  }

  test("partitioning invariance") {
    val texts = (1 to 300).map(i => s"t${i % 17} t${i % 5} u${(i * 7) % 11}")
    assert(spec(texts, parts = 1) == spec(texts, parts = 13))
  }
}
