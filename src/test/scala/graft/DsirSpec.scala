package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import graft.sources.Tables

/** Hashed n-gram importance resampling (§2.11). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // target domain repeats a signature phrase; raw has one doc carrying
  // the phrase and several that do not
  private def fixture = Seq(
    (1L, "alpha beta alpha beta alpha beta", true),
    (2L, "alpha beta gamma alpha beta", true),
    (3L, "alpha beta alpha delta", false),   // target-like raw doc
    (4L, "zulu yankee xray whiskey victor", false),
    (5L, "uniform tango sierra romeo quebec", false),
  ).toDF("doc_id", "text", "tgt")

  test("target-phrase documents outrank off-domain ones") {
    val scores = Dsir.affinityScores(fixture, $"doc_id", $"text", $"tgt")
      .as[(Long, Long)].collect().toMap
    assert(scores(3L) > scores(4L), s"target-like doc must outrank: $scores")
    assert(scores(3L) > scores(5L))
    // per-token normalization isn't applied — but doc 4 and 5 are the
    // same length and both fully off-domain, so smoothing alone sets
    // their scores; they must not exceed the in-domain docs'
    assert(scores(1L) > scores(4L) && scores(2L) > scores(5L))
  }

  test("selection returns top-k by (score desc, id) exactly") {
    val scores = Dsir.affinityScores(fixture, $"doc_id", $"text", $"tgt")
      .as[(Long, Long)].collect()
    val expect = scores.sortBy { case (id, s) => (-s, id) }.take(3).toSeq
    val got = Dsir.importanceSelect(fixture, $"doc_id", $"text", $"tgt", k = 3)
      .as[(Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("scores are partitioning- and order-invariant") {
    val base = Tables.documents(spark, TestSpark.sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.affinityScores(df, $"doc_id", $"text", $"source" === "src0")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(base) == run(base.repartition(17, $"lang").sortWithinPartitions($"n_chars")))
  }

  test("tiny bucket space (forced collisions) stays deterministic") {
    def run() = Dsir.affinityScores(fixture, $"doc_id", $"text", $"tgt",
        buckets = 2).as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run() == run())
    // collisions merge buckets but scores stay defined for every doc
    assert(run().size == 5)
  }

  test("plan: model broadcasts, selection is TakeOrdered, no corpus sort") {
    val df = Dsir.importanceSelect(Tables.documents(spark, TestSpark.sf),
      $"doc_id", $"text", $"source" === "src0", k = 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"lambda table must broadcast into the scoring join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must avoid a global sort:\n$plan")
  }
}
