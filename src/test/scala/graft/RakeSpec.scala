package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rake

/** RAKE keyword extraction (SURVEY.md §2 row 177): hand-computed deg
  * scores, stopword and punctuation boundaries, the maxLen cap, the
  * tie-break, per-document stat isolation, and partitioning
  * invariance. */
class RakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rake(docs: Seq[(Long, String)], maxLen: Int = 4, parts: Int = 1) =
    Rake.topPhrase(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", maxLen)
      .orderBy($"doc_id")
      .as[(Long, Option[String], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq

  test("hand-computed deg scores with a shared word") {
    // phrases: [linear constraints], [linear algebra]
    // deg: linear 2+2=4, constraints 2, algebra 2
    // both phrases score 4+2=6 → tie → lexicographic "linear algebra"
    val got = rake(Seq((1L, "linear constraints of linear algebra")))
    assert(got.head == ((1L, Some("linear algebra"), Some(6L), Some(3L), Some(2L))))
  }

  test("longer phrase outranks when degrees accumulate") {
    // phrases: [deep neural networks], [networks]
    // deg: deep 3, neural 3, networks 3+1=4
    // scores: "deep neural networks" 3+3+4=10, "networks" 4
    val got = rake(Seq((1L, "deep neural networks of networks")))
    assert(got.head._2 == Some("deep neural networks"))
    assert(got.head._3 == Some(10L))
  }

  test("punctuation is a boundary, not glue") {
    val g1 = rake(Seq((1L, "fast, merge")))
    assert(g1.head._5 == Some(1L), "two unigram phrases, not one bigram")
    val g2 = rake(Seq((1L, "fast merge")))
    assert(g2.head._2 == Some("fast merge"))
  }

  test("candidates above maxLen are dropped before stats") {
    // 5-token run is no candidate at maxLen=4; the unigram rules
    val got = rake(Seq((1L, "alpha beta gamma delta epsilon of zeta")))
    assert(got.head._2 == Some("zeta") && got.head._3 == Some(1L))
  }

  test("document with only stopwords/punctuation yields the NULL row") {
    val got = rake(Seq((1L, "the of and ... !!!"), (2L, "real words")))
    assert(got.head == ((1L, None, None, None, None)))
    assert(got(1)._2 == Some("real words"))
  }

  test("stats are per-document, never cross-corpus") {
    // "shared" appears in both docs; if stats leaked across docs its
    // deg would double and doc 1's scores would change
    val solo = rake(Seq((1L, "shared term of other")))
    val both = rake(Seq((1L, "shared term of other"), (2L, "shared thing")))
    assert(solo.head == both.head)
  }

  test("partitioning invariance") {
    val docs = (1L to 40L).map(i =>
      (i, s"alpha w${i % 5} of beta w${i % 3}, gamma the delta"))
    assert(rake(docs, parts = 1) == rake(docs, parts = 9))
  }
}
