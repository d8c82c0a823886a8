package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Cost-based optimization on collected statistics (§2.11): at 100 TB
  * the difference between a broadcast and a shuffle join is decided at
  * PLAN time from table/column statistics — ANALYZE once, and every
  * selective-filter join downstream rightsizes itself. Pins the engine
  * guarantees: (a) ANALYZE-collected row counts reach the optimizer,
  * (b) with CBO on, a selective filter's estimate turns a would-be
  * shuffle join into a static broadcast join that the stats-blind plan
  * does not take (AQE off throughout — this is the PLANNER's call, not
  * a runtime rescue). */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import TestSpark.withConf

  private def setup(): Long = {
    spark.sql("DROP TABLE IF EXISTS cbo_lines")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite").saveAsTable("cbo_lines")
    Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.mode("overwrite").saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_lines COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.table("cbo_lines").count()
  }

  test("analyzed row counts reach the optimizer's plan statistics") {
    val n = setup()
    // row counts ride the cost-based visitor; the default visitor is
    // size-only
    val stats = withConf("spark.sql.cbo.enabled" -> "true") {
      spark.table("cbo_lines").queryExecution.optimizedPlan.stats
    }
    assert(stats.rowCount.contains(BigInt(n)),
      s"ANALYZE row count must surface in plan stats, got $stats")
    assert(stats.sizeInBytes > 0)
  }

  test("column stats turn a selective-filter join into a static broadcast") {
    setup()
    val size = spark.table("cbo_lines")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    // threshold below the RAW size but far above the 1-in-ndv filtered
    // estimate: only a selectivity-aware planner may broadcast
    val threshold = (size / 4).max(1).toString
    def plan(cbo: Boolean) = withConf(
      "spark.sql.cbo.enabled" -> cbo.toString,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> threshold,
    ) {
      spark.table("cbo_orders")
        .join(spark.table("cbo_lines").filter($"l_quantity" === 1),
          $"o_orderkey" === $"l_orderkey")
        .queryExecution.executedPlan.toString
    }
    val withCbo = plan(cbo = true)
    assert(withCbo.contains("BroadcastHashJoin"),
      s"CBO must broadcast the selectively-filtered side:\n$withCbo")
    val blind = plan(cbo = false)
    assert(!blind.contains("BroadcastHashJoin") && blind.contains("SortMergeJoin"),
      s"the stats-blind plan should shuffle at this threshold (the contrast " +
        s"that proves the CBO estimate, not the file size, made the call):\n$blind")
  }
}
