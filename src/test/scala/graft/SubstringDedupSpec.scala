package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringDedup

/** Exact duplicated-substring spans (Lee et al. 2022 style). */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta SHARED ONE TWO THREE omega"),       // cross-doc dup [2,6)
    (2L, "gamma SHARED ONE TWO THREE delta epsilon"),    // cross-doc dup [1,5)
    (3L, "p q r s p q r s tail1 tail2"),                 // self-repeat, overlapping grams
    (4L, "entirely unique words in this document here")  // no dups
  ).toDF("doc_id", "text")

  test("cross-doc and self-repeated spans are found and merged") {
    val spans = SubstringDedup.dupSpans(docs, "doc_id", "text", n = 4)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long)].collect()

    // doc 1: "shared one two three" occurs in docs 1 and 2 -> [2, 6)
    // doc 3: "p q r s" at 0 and 4 plus the bridging 4-grams (q r s p,
    //        r s p q, s p q r) each occurring once — the repeated gram
    //        occurrences [0,4) and [4,8) are adjacent and merge
    assert(spans.toSeq == Seq(
      (1L, 2L, 6L, 4L),
      (2L, 1L, 5L, 4L),
      (3L, 0L, 8L, 8L)))
  }

  test("scrub removes exactly the covered words and is identity elsewhere") {
    val out = SubstringDedup.scrubDupSpans(docs, "doc_id", "text", n = 4)
      .orderBy($"doc_id")
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, "alpha beta omega", 4L),
      (2L, "gamma delta epsilon", 4L),
      (3L, "tail1 tail2", 8L),
      (4L, "entirely unique words in this document here", 0L)))
  }

  test("spans are partitioning-invariant") {
    val base = SubstringDedup.dupSpans(docs, "doc_id", "text", n = 4)
      .orderBy($"doc_id", $"span_start").collect().toSeq
    val shuffled = SubstringDedup.dupSpans(docs.repartition(7), "doc_id", "text", n = 4)
      .orderBy($"doc_id", $"span_start").collect().toSeq
    assert(base == shuffled)
  }

  test("self-repeat scrub keeps the first copy, removes later repeats") {
    val d = Seq(
      (1L, "a b c a b c"),          // exact loop: keep one period
      (2L, "a a a a"),              // overlapping self-repeat
      (3L, "no repeats here at all"),
    ).toDF("doc_id", "text")
    val out = SubstringDedup.selfRepeatScrub(d, "doc_id", "text", n = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a b c", 3L)))
    assert(out(1) == ((2L, "a", 3L)))
    assert(out(2) == ((3L, "no repeats here at all", 0L)))
  }

  test("self-repeat is per-document: cross-doc duplicates survive untouched") {
    // identical docs — the corpus-wide dupSpans would scrub BOTH to
    // nothing; the keep-first self variant must leave each intact
    val d = Seq((1L, "x y z w v u"), (2L, "x y z w v u")).toDF("doc_id", "text")
    val self = SubstringDedup.selfRepeatScrub(d, "doc_id", "text", n = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(self.forall { case (_, t, r) => t == "x y z w v u" && r == 0L })
    val corpusWide = SubstringDedup.scrubDupSpans(d, "doc_id", "text", n = 2)
      .as[(Long, String, Long)].collect()
    assert(corpusWide.forall { case (_, t, r) => t == "" && r == 6L })
  }

  test("cascade attributes each merged span with its longest firing gram") {
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val longBlock = words("L", 12)   // 12 words: fires at n=4 and n=8, not n=12+
    val shortBlock = words("S", 4)   // 4 words: fires at n=4 only
    val cdocs = Seq(
      (1L, s"$longBlock ${words("u", 3)} $shortBlock"),
      (2L, s"${words("v", 3)} $longBlock ${words("w", 2)} $shortBlock")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.dupSpansCascade(cdocs, "doc_id", "text",
        ns = Seq(4, 8), minCount = 2)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1: long block [0,12) max_gram 8, short block [15,19) max_gram 4
    // doc 2: long block [3,15) max_gram 8, short block [17,21) max_gram 4
    assert(spans == Seq(
      (1L, 0L, 12L, 12L, 8L),
      (1L, 15L, 19L, 4L, 4L),
      (2L, 3L, 15L, 12L, 8L),
      (2L, 17L, 21L, 4L, 4L)))

    // union semantics: the cascade's span SET equals the smallest-n
    // fixed run (long dups contain short dups); only max_gram is new
    val fixed = SubstringDedup.dupSpans(cdocs, "doc_id", "text", n = 4)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fixed == spans.map(s => (s._1, s._2, s._3, s._4)))
  }

  test("cascade merges across lengths and is partitioning-invariant") {
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // an 8-word dup block immediately followed by a different 4-word
    // dup block: adjacent intervals of DIFFERENT lengths must merge
    // into one span attributed with the longer gram
    val a = words("A", 8); val b = words("B", 4)
    val cdocs = Seq(
      (1L, s"$a $b"),
      (2L, s"${words("x", 5)} $a ${words("y", 5)} $b")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.dupSpansCascade(cdocs, "doc_id", "text",
        ns = Seq(4, 8), minCount = 2)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans.head == ((1L, 0L, 12L, 12L, 8L)), s"adjacent blocks merge: $spans")

    val re = SubstringDedup.dupSpansCascade(
        cdocs.repartition(7), "doc_id", "text", ns = Seq(4, 8), minCount = 2)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(re == spans)
  }

  test("corpus query finds real duplicated spans at sf0.001") {
    val spans = SubstringDedup.dupSpansQ(spark, TestSpark.sf).collect()
    // every span is at least the gram length and within its doc
    assert(spans.forall(r => r.getLong(3) >= 10))
    assert(spans.forall(r => r.getLong(1) >= 0 && r.getLong(2) > r.getLong(1)))
  }
}
