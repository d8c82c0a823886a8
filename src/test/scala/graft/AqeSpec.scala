package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive-execution engine guarantees (§2.11): at 100 TB, skew is a
  * runtime fact, not a plan-time estimate — AQE must split the hot
  * partition when it materializes. Complements SkewStreamSpec's
  * explicit salting (the fallback when even split partitions
  * bottleneck). */
class AqeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import TestSpark.withConf

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      // one celebrity key carrying ~8 MB of rows; payload must be
      // INCOMPRESSIBLE-ish (per-row hashes) — a constant pad would
      // vanish under shuffle compression and hide the skew from AQE's
      // byte-based detector
      val large = spark.range(0, 20000)
        .select((when($"id" < 16000, 0L).otherwise($"id" % 64)).as("k"),
          concat((0 until 8).map(i => sha2(concat($"id".cast("string"), lit(i)), 256)): _*)
            .as("payload"))
      val small = spark.range(0, 64).select($"id".as("k"), lit(1L).as("v"))
      // keep the payload in the OUTPUT: column pruning would otherwise
      // strip it before the exchange and deflate the hot partition
      val joined = large.join(small, "k").select($"k", $"payload", $"v")
      // materialize THIS DataFrame's own QueryExecution — a count()
      // would plan a separate aggregate query and leave this adaptive
      // plan unexecuted (isFinalPlan=false)
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join split:\n$finalPlan")
    }
  }

  test("a selective dim filter injects a runtime bloom filter on the fact side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val fact = graft.sources.Tables.lineitem(spark, TestSpark.sf)
        .select($"l_orderkey", $"l_quantity")
      val dim = graft.sources.Tables.orders(spark, TestSpark.sf)
        .filter($"o_totalprice" > 400000.0)
        .select($"o_orderkey")
      val plan = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter must prune the fact scan:\n$plan")
    }
  }

  test("the text-scoring hot path sits inside whole-stage codegen") {
    // AQE off: the static physical plan shows WholeStageCodegen nodes
    // without needing an execution pass
    val plan = withConf("spark.sql.adaptive.enabled" -> "false") {
      graft.sources.Tables.documents(spark, TestSpark.sf)
        .select(
          graft.functions.TextFunctions.tokenCount($"text").as("n"),
          graft.functions.TextFunctions.normalize($"text").as("t"))
        .groupBy($"n").count()
        .queryExecution.executedPlan.toString
    }
    // '*(n)' prefixes mark operators fused into a codegen stage; the
    // scan-side projection and both aggregate halves must carry one
    assert(plan.split("\n").exists(l => l.contains("Project") && l.contains("*(")),
      s"projection fell out of codegen:\n$plan")
    assert(plan.split("\n").count(l => l.contains("HashAggregate") && l.contains("*(")) == 2,
      s"both aggregate halves must be codegen'd:\n$plan")
  }
}
