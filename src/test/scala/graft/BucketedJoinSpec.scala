package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Tables, Writer}

/** Bucketed co-located joins (§2.10): pre-shuffled layout ⇒ equi-joins
  * and aggregations on the bucket key plan ZERO exchanges. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  import TestSpark.withConf

  test("bucketed fact-to-fact join and agg plan no exchange") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang", $"n_chars")
    val stats = docs.select($"doc_id", ($"n_chars" * 2).as("score"))
    Writer.writeBucketed(docs, "b_docs", "doc_id", buckets = 8)
    Writer.writeBucketed(stats, "b_stats", "doc_id", buckets = 8)
    // no broadcast escape hatch: the pin must hold for two FACT sides
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
      val expected = docs.join(stats, "doc_id").count()
      assert(joined.count() == expected)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan did not use the bucketing:\n$p")
      // aggregation on the bucket key also rides the layout
      val agg = spark.table("b_docs").groupBy($"doc_id").agg(max($"n_chars"))
      agg.count()
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange hashpartitioning"),
        s"bucketed agg must not shuffle:\n$ap")
    }
  }

  test("bucket pruning: an equality probe reads one bucket") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang", $"n_chars")
    Writer.writeBucketed(docs, "b_probe", "doc_id", buckets = 8)
    val id = docs.select(min($"doc_id")).as[Long].head()
    // a bare filter has no "interesting" distribution requirement, so the
    // planner's auto-bucketed-scan pass would skip the bucketed read (and
    // with it the pruning); pin it on for the probe
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val probe = spark.table("b_probe").filter($"doc_id" === id)
      assert(probe.count() == 1)
      val p = probe.queryExecution.executedPlan.toString
      // SelectedBucketsCount: 1 out of 8
      assert(p.contains("SelectedBucketsCount: 1"),
        s"equality probe should prune to one bucket:\n$p")
    }
  }
}
