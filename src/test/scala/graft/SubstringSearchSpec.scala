package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PhraseSearch

/** Trigram substring search (SURVEY.md §2 row 212): cross-boundary
  * matching, the scattered-trigram false-candidate removal, short-doc
  * handling, exactness against a brute contains scan, and partitioning
  * invariance. */
class SubstringSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def search(docs: Seq[(Long, String)], pats: Seq[String], parts: Int = 1) =
    PhraseSearch.substringSearch(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", pats)
      .orderBy($"query", $"doc_id")
      .as[(String, Long)].collect().toSeq

  test("matches substrings across token boundaries and punctuation") {
    val docs = Seq(
      (1L, "the fast scan merge path"),
      (2L, "fast scan, merge path"),     // punctuation breaks the substring
      (3L, "a scan merges quickly"))     // 'scan merge' inside 'scan merges'
    val got = search(docs, Seq("scan merge"))
    assert(got == Seq(("scan merge", 1L), ("scan merge", 3L)))
  }

  test("all trigrams present but scattered is vetoed by the verify") {
    // contains every trigram of 'abcdef' except as one run
    val docs = Seq((1L, "abcd zzz bcde zzz cdef zzz def"), (2L, "xx abcdef yy"))
    val got = search(docs, Seq("abcdef"))
    assert(got == Seq(("abcdef", 2L)))
  }

  test("docs shorter than 3 chars never match; 3-char pattern exact") {
    val docs = Seq((1L, "ab"), (2L, "abc"), (3L, "zabcz"))
    val got = search(docs, Seq("abc"))
    assert(got == Seq(("abc", 2L), ("abc", 3L)))
  }

  test("agrees exactly with a brute-force contains scan") {
    val docs = (1L to 200L).map(i =>
      (i, s"token${i % 17} filter push ${(i * 7) % 23} scan merge tail${i % 5}"))
    val pats = Seq("filter push", "scan merge", "token3 f")
    val got = search(docs, pats).toSet
    val brute = (for { (id, t) <- docs; p <- pats if t.contains(p) } yield (p, id)).toSet
    assert(got == brute)
  }

  test("partitioning invariance") {
    val docs = (1L to 150L).map(i => (i, s"w${i % 9} scan merge x${i % 4}"))
    assert(search(docs, Seq("scan merge"), parts = 1) ==
      search(docs, Seq("scan merge"), parts = 13))
  }
}
