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
}
