package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hygiene

/** Frequency truecasing (SURVEY.md §2 row 176): majority vote, the
  * lexicographic tie-break, acronym preservation, ALL-CAPS repair,
  * token-free spine rows, and partitioning invariance. */
class TruecaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tc(docs: Seq[(Long, String)], parts: Int = 1) =
    Hygiene.truecase(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("majority surface form wins; shouting folds back") {
    val docs = Seq((1L, "the cat"), (2L, "the cat dog"), (3L, "THE CAT"))
    val got = tc(docs)
    assert(got(2) == ((3L, 2L, 2L, "the cat")), got.mkString("; "))
    assert(got(0) == ((1L, 2L, 0L, "the cat")))
  }

  test("a corpus-dominant acronym is preserved, not lowercased") {
    val docs = Seq((1L, "NASA launch"), (2L, "NASA orbit"), (3L, "nasa said"))
    val got = tc(docs)
    assert(got(2)._4 == "NASA said")
    assert(got(2)._3 == 1L)
  }

  test("vote tie breaks lexicographically (uppercase < lowercase in ASCII)") {
    val docs = Seq((1L, "Mix"), (2L, "mix"))
    // 1 vote each: "Mix" < "mix" lexicographically → canonical "Mix"
    val got = tc(docs)
    assert(got.map(_._4) == Seq("Mix", "Mix"))
  }

  test("positions survive reassembly in order") {
    val got = tc(Seq((1L, "c b a c")))
    assert(got.head._4 == "c b a c")
  }

  test("token-free doc stays on the spine as an empty row") {
    val got = tc(Seq((1L, "word here"), (2L, "!!! ...")))
    assert(got(1) == ((2L, 0L, 0L, "")))
  }

  test("digits participate as ordinary tokens") {
    val got = tc(Seq((1L, "x 42 X 42")))
    // "x" vs "X": 1 vote each → "X" wins lexicographically
    assert(got.head._4 == "X 42 X 42")
  }

  test("partitioning invariance on the seeded registered corpus") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 7 == 0) "THE TABLE SCAN" else "the table scan extra"))
    assert(tc(docs, 1) == tc(docs, 13))
  }
}
