package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanCorrupt

/** Span-corruption example generation (SURVEY.md §2 row 166):
  * round-trip reconstruction, sentinel structure, the degenerate
  * noise settings, empty/NULL docs, and partitioning invariance. */
class SpanCorruptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def run(df: org.apache.spark.sql.DataFrame,
                  blockLen: Int = 3, noisePct: Int = 15) =
    SpanCorrupt.spanCorrupt(df, "doc_id", "text", blockLen, noisePct)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap

  /** Splice target spans back into the input at their sentinels —
    * must reproduce the original token stream exactly. */
  private def reconstruct(input: String, target: String, nSpans: Long): String = {
    val spans = (0L until nSpans).map { k =>
      val from = target.indexOf(s"<extra_id_$k>") + s"<extra_id_$k>".length
      val to = target.indexOf(s"<extra_id_${k + 1}>")
      k -> target.substring(from, to).trim
    }.toMap
    spans.foldLeft(input) { case (acc, (k, span)) =>
      acc.replace(s"<extra_id_$k>", span)
    }.replaceAll(" +", " ").trim
  }

  test("round-trip: splicing target spans into the input restores the tokens") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val m = run(docs((1L, text)))
    val (_, in, tg, n) = m(1L)
    assert(reconstruct(in, tg, n) == text)
    assert(tg.endsWith(s"<extra_id_$n>"), tg)
    // every sentinel 0..n-1 appears exactly once in input and target
    (0L until n).foreach { k =>
      assert(in.split(" ").count(_ == s"<extra_id_$k>") == 1, s"$k in $in")
      assert(tg.split(" ").count(_ == s"<extra_id_$k>") == 1, s"$k in $tg")
    }
  }

  test("noise density lands near the configured percentage on a long doc") {
    val text = (1 to 3000).map(i => s"tok$i").mkString(" ")
    val (_, in, _, n) = run(docs((7L, text)))(7L)
    val kept = in.split(" ").count(!_.startsWith("<extra_id_"))
    val masked = 3000 - kept
    assert(masked > 3000 * 5 / 100 && masked < 3000 * 30 / 100,
      s"masked=$masked n_spans=$n")
    assert(n > 0)
  }

  test("noisePct=0 passes tokens through; noisePct=100 masks everything into one span") {
    val text = "alpha beta gamma delta epsilon zeta"
    val z = run(docs((1L, text)), noisePct = 0)(1L)
    assert(z._2 == text && z._3 == "<extra_id_0>" && z._4 == 0L, z.toString)
    val f = run(docs((1L, text)), noisePct = 100)(1L)
    assert(f._2 == "<extra_id_0>", f.toString)
    assert(f._3 == s"<extra_id_0> $text <extra_id_1>" && f._4 == 1L, f.toString)
  }

  test("empty and NULL text docs keep their row: input '', target final sentinel") {
    val m = run(docs((1L, ""), (2L, null), (3L, "только кириллица здесь")))
    assert(m(1L) == ((1L, "", "<extra_id_0>", 0L)), m(1L).toString)
    assert(m(2L) == ((2L, "", "<extra_id_0>", 0L)), m(2L).toString)
    // no [A-Za-z0-9] tokens at all -> same shape
    assert(m(3L)._2 == "" && m(3L)._4 == 0L, m(3L).toString)
  }

  test("mask choice is a pure function of (doc_id, block): partitioning-invariant") {
    val df = (1L to 200L).map(i =>
      (i, (1 to 40).map(j => s"d${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val a = SpanCorrupt.spanCorrupt(df, "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    val b = SpanCorrupt.spanCorrupt(df.repartition(13), "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
