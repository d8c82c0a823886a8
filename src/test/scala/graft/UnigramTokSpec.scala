package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramTok

/** SentencePiece-style unigram tokenizer (SURVEY.md §2 row 236):
  * integer Viterbi semantics (cost = 64 − bitlen(count), fewest-
  * pieces / longest-first tiebreaks), OOV coverage, hard-EM pruning,
  * unbounded word length, and encode reassembly. */
class UnigramTokSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vocabOf(pairs: (String, Long)*) =
    pairs.map { case (p, sc) => (p, 0L, sc) }.toDF("piece", "cnt", "sc")

  private def segment(word: String, vocab: Seq[(String, Long)]): Seq[String] =
    UnigramTok.segmentWords(Seq(word).toDF("w"), vocabOf(vocab: _*), 4)
      .select($"pieces").as[Seq[String]].collect().head

  test("a frequent long piece beats its char decomposition") {
    // "abcd" score 10 (cost 54) vs 4 chars at score 5 (cost 59 each)
    val v = Seq("abcd" -> 10L, "a" -> 5L, "b" -> 5L, "c" -> 5L, "d" -> 5L)
    assert(segment("abcd", v) == Seq("abcd"))
    assert(segment("abcdab", v) == Seq("abcd", "a", "b"))
  }

  test("cheap chars beat a rare long piece") {
    // "abcd" score 1 (cost 63·1=63) loses to 4 chars at score 63 (cost 1 each, total 4)
    val v = Seq("abcd" -> 1L, "a" -> 63L, "b" -> 63L, "c" -> 63L, "d" -> 63L)
    assert(segment("abcd", v) == Seq("a", "b", "c", "d"))
  }

  test("equal cost: fewer pieces, then longest first piece wins") {
    // "ab"+"cd" vs "abc"+"d" — both 2 pieces, equal cost; longest
    // FIRST piece ("abc") must win the tie
    val v = Seq("ab" -> 7L, "cd" -> 7L, "abc" -> 7L, "d" -> 7L)
    assert(segment("abcd", v) == Seq("abc", "d"))
    // 1 piece beats 2 pieces when total cost ties is impossible here
    // (fewer pieces is always cheaper at equal per-piece cost), but
    // the k tiebreak guards score-asymmetric ties:
    val v2 = Seq("abcd" -> 0L, "ab" -> 32L, "cd" -> 32L)
    // cost("abcd") = 64; cost(ab)+cost(cd) = 32+32 = 64 — tie; k: 1 < 2
    assert(segment("abcd", v2) == Seq("abcd"))
  }

  test("OOV characters fall back to single chars at max cost") {
    val v = Seq("ab" -> 10L)
    assert(segment("axb", v) == Seq("a", "x", "b"))
    assert(segment("ab", v) == Seq("ab"))
  }

  test("words longer than the oracle unroll still segment (engine is unbounded)") {
    val w = "ab" * 20 // 40 chars > OracleMaxWordLen
    val v = Seq("abab" -> 20L, "ab" -> 10L)
    assert(segment(w, v) == Seq.fill(10)("abab"))
  }

  test("hard EM prunes unused pieces and keeps used ones") {
    // corpus: "abab" x3 and "cd" x2 — seed vocab holds every substring;
    // after one EM round only the pieces Viterbi actually CHOSE survive
    val docs = Seq((1L, "abab abab cd"), (2L, "abab cd")).toDF("doc_id", "text")
    val v1 = UnigramTok.train(docs, "text", maxPiece = 4, vocabSize = 16, iters = 1)
      .select($"piece", $"cnt").as[(String, Long)].collect().toMap
    // "abab" (score 3 from 3 occurrences... seed cnt 3 -> bitlen 2; chars
    // cost more) is chosen for every "abab" word; "cd" likewise
    assert(v1.keySet == Set("abab", "cd"), s"EM vocab: $v1")
    assert(v1("abab") == 3L && v1("cd") == 2L)
  }

  test("encode reassembles pieces in word order with the doc spine") {
    val docs = Seq((1L, "abab cd abab"), (2L, "")).toDF("doc_id", "text")
    val vocab = vocabOf("abab" -> 10L, "cd" -> 10L,
      "a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L)
    val got = UnigramTok.encode(docs, "doc_id", "text", vocab)
      .orderBy($"doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, "abab cd abab"), (2L, 0L, "")))
  }

  test("segmentation is partitioning-invariant") {
    val docs = (1 to 50).map(i => (i.toLong, s"w$i abab cd")).toDF("doc_id", "text")
    def run(parts: Int) =
      UnigramTok.encode(docs.repartition(parts), "doc_id", "text",
          UnigramTok.train(docs, "text", iters = 1))
        .orderBy($"doc_id").as[(Long, Long, String)].collect().toSeq
    assert(run(1) == run(13))
  }
}
