package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.NanosFilterPushdown
import graft.sources.Tables

/** NanosFilterPushdown: a naive filter on the CONVERTED events
  * timestamp must reach the raw nanos parquet scan, with results
  * bit-identical to the unoptimized plan. */
class NanosPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val lo = "2024-01-05 00:00:00"
  private val hi = "2024-01-08 00:00:00"

  private def naive() = Tables.events(spark, TestSpark.sf)
    .filter(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") <  lit(hi).cast("timestamp"))

  test("rule injects raw-nanos bounds that reach PushedFilters") {
    NanosFilterPushdown.install(spark)
    try {
      val p = naive().queryExecution.executedPlan.toString
      // the derived bound lands on the raw long ts column in the scan
      assert(p.contains("PushedFilters") &&
        (p.contains("GreaterThanOrEqual(ts,") || p.contains("GreaterThan(ts,")), p)
    } finally uninstall()
  }

  test("results are identical with and without the rule") {
    val without = naive().orderBy("event_id").collect().toSeq
    NanosFilterPushdown.install(spark)
    val withRule = try naive().orderBy("event_id").collect().toSeq
      finally uninstall()
    assert(withRule == without && without.nonEmpty)
  }

  test("sentinel literal beyond nanos range derives no bound, results intact") {
    // ts <= '9999-12-31' is ≈2.53e17 µs; *1000 would wrap negative. The
    // rule must skip derivation (original filter alone) — not filter out
    // everything via an overflowed bound.
    def sentinel() = Tables.events(spark, TestSpark.sf)
      .filter(col("ts") <= lit("9999-12-31 00:00:00").cast("timestamp"))
    val without = sentinel().count()
    NanosFilterPushdown.install(spark)
    val withRule = try sentinel().count() finally uninstall()
    assert(withRule == without && without > 0)
  }

  test("literal-on-the-left mirror derives the flipped bound") {
    // lit(lo) <= ts  ≡  ts >= lit(lo): the mirrored case must inject a
    // raw-nanos lower bound into PushedFilters.
    NanosFilterPushdown.install(spark)
    try {
      val df = Tables.events(spark, TestSpark.sf)
        .filter(lit(lo).cast("timestamp") <= col("ts"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts,"), p)
      // and values match the unmirrored form
      val direct = Tables.events(spark, TestSpark.sf)
        .filter(col("ts") >= lit(lo).cast("timestamp")).count()
      assert(df.count() == direct && direct > 0)
    } finally uninstall()
  }

  test("rule is a no-op when no converted-timestamp filter is present") {
    NanosFilterPushdown.install(spark)
    try {
      val df = Tables.events(spark, TestSpark.sf).filter(col("user_id") === 7)
      assert(df.count() >= 0) // just must not break planning
    } finally uninstall()
  }

  private def uninstall(): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ss.experimental.extraOptimizations =
      ss.experimental.extraOptimizations.filterNot(_ == NanosFilterPushdown)
  }
}
