package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prefix

/** Bucketed cumulative-prefix engine (the shared decomposition behind
  * ABC classes, RFM scores and ROC-AUC): bit-exact parity against the
  * single-window form on a 50k-distinct-double-scale frame, both
  * directions, tiebreak honoring, and the plan pin that no window
  * rides the data frame unpartitioned. */
class PrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 50k rows with hash-derived near-continuous order keys — the shape
  // that used to funnel through ONE unpartitioned window task
  private lazy val big = spark.range(50000).select(
    (xxhash64(col("id")) % 1000000L).as("k"),
    col("id").as("tie"),
    (pmod(col("id"), lit(97)) + 1L).as("v"))

  private def singleWindow(desc: Boolean) = {
    import org.apache.spark.sql.expressions.Window
    val ord = if (desc) Seq(col("k").desc, col("tie").asc)
              else Seq(col("k").asc, col("tie").asc)
    big.withColumn("cum", sum(col("v")).over(
      Window.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("k"), col("tie"), col("v"), col("cum"))
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("ascending parity with the single-window form at 50k") {
    val got = Prefix.cumSumBucketed(big, "k", descending = false,
        tieCols = Seq("tie"), valueCol = "v", out = "cum")
      .select(col("k"), col("tie"), col("v"), col("cum"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == singleWindow(desc = false))
  }

  test("descending parity with the single-window form at 50k") {
    val got = Prefix.cumSumBucketed(big, "k", descending = true,
        tieCols = Seq("tie"), valueCol = "v", out = "cum")
      .select(col("k"), col("tie"), col("v"), col("cum"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == singleWindow(desc = true))
  }

  test("ties on the order key follow the tiebreak inside one cell") {
    val df = Seq((5L, 2L, 10L), (5L, 1L, 1L), (3L, 9L, 100L))
      .toDF("k", "tie", "v")
    val got = Prefix.cumSumBucketed(df, "k", descending = false,
        tieCols = Seq("tie"), valueCol = "v", out = "cum")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got((3L, 9L)) == 100L)
    assert(got((5L, 1L)) == 101L)
    assert(got((5L, 2L)) == 111L)
  }

  test("null order keys match the single-window null placement, both directions") {
    import org.apache.spark.sql.expressions.Window
    val rows: Seq[(java.lang.Long, Long, Long)] =
      (1L to 2000L).map(i => (java.lang.Long.valueOf(i % 97), i, i % 7 + 1L)) ++
        Seq((null.asInstanceOf[java.lang.Long], 9001L, 100L),
          (null.asInstanceOf[java.lang.Long], 9002L, 200L))
    val df = rows.toDF("k", "tie", "v")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq(col("k").desc, col("tie").asc)
                else Seq(col("k").asc, col("tie").asc)
      val want = df.withColumn("cum", sum(col("v")).over(
          Window.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("tie"), col("cum")).as[(Long, Long)].collect().toSet
      val got = Prefix.cumSumBucketed(df, "k", descending = desc,
          tieCols = Seq("tie"), valueCol = "v", out = "cum")
        .select(col("tie"), col("cum")).as[(Long, Long)].collect().toSet
      assert(got == want, s"desc=$desc")
    }
  }

  test("plan pin: every window key is engine-internal (__b)") {
    val p = Prefix.cumSumBucketed(big, "k", descending = false,
        tieCols = Seq("tie"), valueCol = "v", out = "cum")
      .queryExecution.executedPlan.toString
    // no window orders the raw frame globally; the only unpartitioned
    // window rides the bounded __b cut frame, the data-frame cumsum is
    // partitioned by __b
    assert("windowspecdefinition\\((?!__)".r.findFirstIn(p).isEmpty, p)
    assert("windowspecdefinition\\(__b#\\d+[^,]*, k#".r.findFirstIn(p).nonEmpty, p)
  }
}
