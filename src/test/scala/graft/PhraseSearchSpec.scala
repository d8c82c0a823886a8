package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PhraseSearch

/** Positional phrase retrieval (SURVEY.md §2 row 173): consecutive-
  * position semantics, overlap counting, repeated-term phrases,
  * punctuation/case folding, the unigram degenerate case, and
  * partitioning invariance. */
class PhraseSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrases: Seq[(Long, String)],
                  parts: Int = 1) =
    PhraseSearch.phraseMatch(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", phrases)
      .orderBy($"phrase_id", $"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("matches only consecutive positions, in order") {
    val docs = Seq(
      (1L, "the table scan runs"),      // match at pos 1
      (2L, "the scan table runs"),      // reversed: no match
      (3L, "table fast scan"))          // gap: no match
    assert(run(docs, Seq((1L, "table scan"))) == Seq((1L, 1L, 1L, 1L)))
  }

  test("overlapping occurrences each count") {
    val docs = Seq((1L, "a a a a"))
    // "a a" matches at starts 0,1,2
    assert(run(docs, Seq((1L, "a a"))) == Seq((1L, 1L, 3L, 0L)))
  }

  test("repeated-term phrase needs every offset filled") {
    val docs = Seq((1L, "go go x go"), (2L, "go x go"))
    assert(run(docs, Seq((1L, "go go"))) == Seq((1L, 1L, 1L, 0L)))
  }

  test("punctuation and case fold into the token stream") {
    val docs = Seq((1L, "Table, SCAN! fast"))
    assert(run(docs, Seq((1L, "table scan"))) == Seq((1L, 1L, 1L, 0L)))
  }

  test("unigram phrase degenerates to term occurrence count") {
    val docs = Seq((1L, "x customer y customer"), (2L, "nothing here"))
    assert(run(docs, Seq((1L, "customer"))) == Seq((1L, 1L, 2L, 1L)))
  }

  test("a doc matching one phrase does not leak into another") {
    val docs = Seq((1L, "table scan"), (2L, "fast merge batch go"))
    val got = run(docs, Seq((1L, "table scan"), (2L, "fast merge batch")))
    assert(got == Seq((1L, 1L, 1L, 0L), (2L, 2L, 1L, 0L)))
  }

  test("partial suffix/prefix of the phrase is not a match") {
    val docs = Seq((1L, "fast merge stop batch"), (2L, "merge batch"))
    assert(run(docs, Seq((1L, "fast merge batch"))) == Seq.empty)
  }

  test("partitioning invariance on the real corpus workload") {
    val docs = (1L to 60L).map(i =>
      (i, s"w${i % 7} table scan w${i % 5} " * (1 + (i % 3)).toInt))
    val a = run(docs, PhraseSearch.Phrases, parts = 1)
    val b = run(docs, PhraseSearch.Phrases, parts = 11)
    assert(a == b && a.nonEmpty)
  }
}
