package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Tables, Writer}

/** Scan-time pushdown breadth (§2.10): parquet aggregate pushdown and
  * dynamic partition pruning — at 100 TB these are the difference
  * between a metadata probe and a full scan, and between reading one
  * day and reading the table. */
class ScanOptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  import TestSpark.withConf

  test("count/min/max resolve from parquet footer statistics") {
    // aggregate pushdown rides the V2 parquet scan (the V1 default
    // cannot); both are runtime confs, scoped here
    withConf(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "avro,csv,json,kafka,orc,text") {
      val df = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min($"l_quantity").as("mn"),
          max($"l_quantity").as("mx"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"aggregate did not push to the scan:\n$p")
      // and the pushed answer matches the computed one
      val full = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
        .select($"l_quantity").collect().map(_.getDouble(0))
      val row = df.head()
      assert(row.getLong(0) == full.length)
      assert(row.getDouble(1) == full.min && row.getDouble(2) == full.max)
    }
  }

  test("dynamic partition pruning on the day-partitioned sink") {
    val days = Tables.events(spark, TestSpark.sf)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_id", $"value")
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString + "/t"
    Writer.appendByDay(days, dir)
    val nDays = days.select($"day").distinct().count()
    assert(nDays > 2, "need several partitions for pruning to mean anything")
    // dim side filtered on a NON-join column (the TPC-DS shape): the
    // qualifying day is only discoverable at runtime through the join,
    // so static constraint propagation cannot pre-prune the fact side
    import org.apache.spark.sql.expressions.Window
    val dim = days.groupBy($"day").count()
      .withColumn("rk", row_number().over(Window.orderBy($"day")))
      .filter($"rk" === 1).select($"day".as("d"))
    val fact = Writer.readTable(spark, dir)
    val joined = fact.join(dim, fact("day") === dim("d"))
    val expected = {
      val d0 = dim.as[String].head()
      days.filter($"day" === d0).count()
    }
    assert(joined.count() == expected)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"no dynamic pruning filter on the partitioned scan:\n$p")
  }
}
