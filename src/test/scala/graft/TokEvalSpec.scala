package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TokEval

/** Tokenizer fertility eval (SURVEY.md §2 row 238): structural
  * invariants both tokenizers must satisfy on a real corpus. */
class TokEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fertility invariants hold for both tokenizers at sf0.001") {
    val rows = TokEval.tokFertilityQ(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows.map(_._1) == Seq("bpe", "unigram"))
    val Seq(bpe, uni) = rows
    // same corpus: word and char totals identical across tokenizers
    assert(bpe._2 == uni._2 && bpe._3 == uni._3)
    for (r <- rows) {
      val (_, nWords, nChars, nPieces, nSingle, fert, cpp, single) = r
      assert(nPieces >= nWords, "at least one piece per word")
      assert(nPieces <= nChars, "at most one piece per char")
      assert(nSingle <= nPieces)
      assert(fert >= 1000000L, "fertility >= 1 piece/word")
      assert(cpp >= 1000000L, "pieces are at least one char")
      assert(single <= 1000000L)
      assert(fert == nPieces * 1000000L / nWords, "ppm floor division")
    }
    // both tokenizers actually compress: strictly fewer pieces than chars
    assert(rows.forall(r => r._4 < r._3), s"no compression: $rows")
  }
}
