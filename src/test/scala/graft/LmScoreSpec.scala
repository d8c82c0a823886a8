package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore
import graft.sources.Tables

/** Unigram LM quality scoring: the exact fold is a pure function of the
  * corpus (partitioning-invariant), agrees with the fast AVG path to
  * float tolerance, and actually separates fluent from garbage text. */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf)

  test("exact scores are bit-identical across partitionings") {
    def scores(d: org.apache.spark.sql.DataFrame) =
      LmScore.unigramLogProb(d, "doc_id", "text", exact = true)
        .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    val a = scores(docs.repartition(1))
    val b = scores(docs.repartition(13, $"lang"))
    assert(a.nonEmpty && a == b, "sorted-fold scores must not depend on partitioning")
  }

  test("fast path agrees with the exact fold to float tolerance") {
    val e = LmScore.unigramLogProb(docs, "doc_id", "text", exact = true)
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    val f = LmScore.unigramLogProb(docs, "doc_id", "text", exact = false)
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    assert(e.keySet == f.keySet)
    val worst = e.map { case (k, v) => math.abs(v - f(k)) }.max
    assert(worst < 1e-9, s"exact vs fast diverged by $worst")
  }

  test("rare-garbage text scores far below fluent text") {
    val common = (1 to 40).map(i => s"word${i % 8}").mkString(" ") // 8 common types
    val garbage = (1 to 40).map(i => s"qzx$i").mkString(" ")       // 40 singletons
    // background corpus: many docs reusing the common vocabulary
    val bg = (1L to 20L).map(i => (i, common)) :+ (100L, garbage)
    val scored = LmScore.unigramLogProb(bg.toDF("doc_id", "text"), "doc_id", "text",
        exact = true)
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    assert(scored(100L) < scored(1L) - 2.0,
      s"garbage ${scored(100L)} should sit nats below fluent ${scored(1L)}")
  }

  // ---- bigram LM (§2 row 115) ----

  test("bigram score matches a hand reference on a crafted corpus") {
    // corpus: "a b" x2 and "a c" x1 → C(a)=3, C(b)=2? no: tokens a,b,a,b,a,c
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = LmScore.bigramLogProb(df, "doc_id", "text", lambda = 0.7)
      .select($"doc_id", $"n_tokens", $"avg_logprob")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // corpus stats: N=6, C(a)=3, C(b)=2, C(c)=1; C(a,b)=2, C(a,c)=1
    val N = 6d
    def doc(cab: Double, cb: Double): Double = {
      val p1 = math.log(3d / N)                      // first token 'a'
      val p2 = math.log(0.7 * (cab / 3d) + 0.3 * (cb / N))
      (p1 + p2) / 2d
    }
    assert(got(1L)._1 == 2L)
    assert(math.abs(got(1L)._2 - doc(2d, 2d)) < 1e-12)
    assert(math.abs(got(3L)._2 - doc(1d, 1d)) < 1e-12)
  }

  test("bigram scores are bit-identical across partitionings") {
    def scores(d: org.apache.spark.sql.DataFrame) =
      LmScore.bigramLogProb(d, "doc_id", "text")
        .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    val a = scores(docs.repartition(1))
    val b = scores(docs.repartition(13, $"lang"))
    assert(a.nonEmpty && a == b)
  }

  test("word salad from common words: unigram passes it, bigram catches it") {
    val fluent = (1 to 30).map(i => s"w${i % 6} x${i % 6}").mkString(" ")
    // same token distribution, transitions scrambled to unseen pairs
    val salad = (1 to 30).map(i => s"w${i % 6} x${(i + 3) % 6}").mkString(" ")
    val bg = (1L to 20L).map(i => (i, fluent)) :+ (100L, salad)
    val uni = LmScore.unigramLogProb(bg.toDF("doc_id", "text"), "doc_id", "text",
        exact = true)
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    val big = LmScore.bigramLogProb(bg.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    // unigram can't separate them by much; bigram must
    assert(uni(100L) > uni(1L) - 0.5, s"unigram gap unexpectedly large: ${uni}")
    assert(big(100L) < big(1L) - 0.5,
      s"bigram should separate salad ${big(100L)} from fluent ${big(1L)}")
  }

  test("collocations: a bound phrase tops independent co-occurrences") {
    // "san francisco" always co-occurs; filler words pair freely
    val docs = (1 to 30).map { i =>
      (i.toLong, "san francisco " + Seq("the", "of", "and", "to", "in")
        .map(w => w + " " + Seq("the", "of", "and", "to", "in")((i + w.length) % 5))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val top = graft.operators.LmScore.collocations(
        docs, $"doc_id", $"text", minCount = 10, topK = 3)
      .select($"bigram").as[String].collect()
    assert(top.head == "san francisco", s"got ${top.toSeq}")
  }

  test("collocation output is lift-descending and deterministic across partitionings") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.LmScore.collocations(
          df, $"doc_id", $"text", minCount = 5, topK = 50)
        .as[(String, Long, Long)].collect().toSeq
    val got = run(docs)
    assert(got.map(_._3) == got.map(_._3).sortBy(-_),
      "output must be lift-descending")
    assert(got == run(docs.repartition(11, $"lang")))
  }

  test("collocations plan: count tables broadcast, selection is TakeOrdered") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val plan = graft.operators.LmScore.collocations(docs, $"doc_id", $"text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"vocab tables must broadcast:\n$plan")
  }

  test("a one-word document scores its unigram probability") {
    val df = Seq((1L, "solo"), (2L, "solo pair"), (3L, "solo pair")).toDF("doc_id", "text")
    val got = LmScore.bigramLogProb(df, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"avg_logprob")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // N=5, C(solo)=3 → score(doc1) = ln(3/5) / 1
    assert(got(1L)._1 == 1L)
    assert(math.abs(got(1L)._2 - math.log(3d / 5d)) < 1e-12)
  }
}
