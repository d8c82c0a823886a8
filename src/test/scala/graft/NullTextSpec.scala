package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** The structural NULL-text guard (round-13 verdict item 6): every
  * shared tokenizer in TextFunctions folds NULL to the EMPTY document
  * — zero tokens, '' normalization, ratio 0 — so operators composed on
  * them can never reproduce the size(NULL) denominator bug class
  * (commit ad608df) no matter what a future round builds on top. */
class NullTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val row = Seq((1L, null: String, "The Cat  AND dog 42"))
    .toDF("id", "nul", "txt")

  test("NULL tokenizes as the empty document across every shared tokenizer") {
    val got = row.select(
      tokens(col("nul")), tokenCount(col("nul")), wsTokens(col("nul")),
      normalize(col("nul")), alphaRatio(col("nul")), qualityScore(col("nul")),
      shingles(col("nul"))).head()
    assert(got.getSeq[String](0).isEmpty)        // tokens
    assert(got.getLong(1) == 0L)                 // tokenCount
    assert(got.getSeq[String](2).isEmpty)        // wsTokens
    assert(got.getString(3) == "")               // normalize
    assert(got.getDouble(4) == 0.0)              // alphaRatio
    assert(got.getDouble(5) == 0.0)              // qualityScore
    assert(got.getSeq[String](6).isEmpty)        // shingles
  }

  test("non-NULL text is unchanged by the guard") {
    val got = row.select(
      tokens(col("txt")), wsTokens(col("txt")), normalize(col("txt"))).head()
    assert(got.getSeq[String](0) == Seq("The", "Cat", "AND", "dog", "42"))
    assert(got.getSeq[String](1) == Seq("the", "cat", "and", "dog", "42"))
    assert(got.getString(2) == "the cat  and dog 42".replace("  ", " "))
  }
}
