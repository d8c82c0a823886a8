package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScanOps
import graft.plans.MultiPatternCount

/** Aho–Corasick multi-pattern counting + the vocabulary-growth curve
  * (round 15, §2 rows 309-310). */
class ScanOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force overlapping substring count. */
  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("automaton counts equal brute force, overlaps and nesting included") {
    val pats = Seq("ab", "aba", "ba", "b", "xé", "é")
    val texts = Seq("ababab", "bbbb", "", "xyz", "xéxé", "aba aba", "éé")
    val ac = MultiPatternCount.build(pats)
    for (t <- texts) {
      val got = MultiPatternCount.compute(ac,
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toLongArray()
      val want = pats.map(naive(t, _))
      assert(got.toSeq == want, s"text '$t'")
    }
    // 'ababab': ab x3, aba x2 (overlapping!), ba x2, b x3
    val g = MultiPatternCount.compute(ac,
      org.apache.spark.unsafe.types.UTF8String.fromString("ababab")).toLongArray()
    assert(g.take(4).toSeq == Seq(3L, 2L, 2L, 3L))
  }

  test("codegen and interpreted paths agree; NULL text yields NULL") {
    val df = Seq((1L, "batch batch batch"), (2L, "no hits here"), (3L, null))
      .toDF("id", "t")
    val c = MultiPatternCount.multi_pattern_count(col("t"), Seq("batch batch", "batch"))
    val whole = df.select($"id", c.as("n")).orderBy($"id").collect()
    // self-overlap: 'batch batch' twice in the triple
    assert(whole(0).getSeq[Long](1) == Seq(2L, 3L))
    assert(whole(1).getSeq[Long](1) == Seq(0L, 0L))
    assert(whole(2).isNullAt(1))
    // force the interpreted path via a non-codegen context (eval)
    val ac = MultiPatternCount.build(Seq("batch batch", "batch"))
    val ev = MultiPatternCount.compute(ac,
      org.apache.spark.unsafe.types.UTF8String.fromString("batch batch batch"))
    assert(ev.toLongArray().toSeq == Seq(2L, 3L))
  }

  test("registered query drops zero counts and orders deterministically") {
    val got = ScanOps.multiMatchQ(spark, TestSpark.sf)
    assert(got.filter($"n_hits" <= 0).count() == 0)
    assert(got.count() > 0)
    // the é fragment never matches the ASCII corpus
    assert(got.filter($"pattern" === "é").count() == 0)
  }

  test("vocab growth equals a collect-side replay; curve is monotone") {
    val df = graft.sources.Tables.documents(spark, TestSpark.sf)
    val got = ScanOps.vocabGrowth(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == ScanOps.GrowthLadder)
    // monotone non-decreasing in n
    assert(got.sliding(2).forall {
      case Seq((_, a), (_, b)) => a <= b
      case _ => true
    })
    // brute-force replay of the smallest two ladder points, using the
    // same normalization the operator tokenizes with (lower + \s+ -> ' ')
    val toks = df.orderBy($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (_, t) =>
        Option(t).getOrElse("").trim.toLowerCase
          .replaceAll("\\s+", " ").split(" ", -1)
      }.toSeq
    def vocabAt(n: Int) = toks.take(n).distinct.length.toLong
    assert(got.head._2 == vocabAt(4))
    assert(got(1)._2 == vocabAt(16))
    assert(got(3)._2 == vocabAt(256))
  }
}
