package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HealthPipeline
import graft.operators.HealthPipeline.SourceDef
import graft.sources.{Tables, Writer}

/** The reference DAG end-to-end: extract→land→transform→combine→append,
  * run twice to prove incremental idempotence. */
class HealthPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** "API" stand-in: one event type's daily rows inside a date window,
    * shaped like the raw JSON the reference lands (nested metric). */
  private def sourceFor(eventType: String)(start: LocalDate, end: LocalDate) =
    Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === eventType &&
        to_date(col("ts")).between(
          java.sql.Date.valueOf(start), java.sql.Date.valueOf(end)))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(struct(count(lit(1)).as("n"),
        sum(col("value")).cast("double").as("total")).as("metric"))

  test("daily DAG lands, combines and appends incrementally") {
    val zone = Files.createTempDirectory("graft_hp_zone").toString
    val wh = Files.createTempDirectory("graft_hp_wh").toString + "/oura_day"
    val sources = Seq(
      SourceDef("clicks", sourceFor("click")),
      SourceDef("purchases", sourceFor("purchase"), chunkDays = Some(7)))

    // first run on 2024-01-20: backfill window, appends everything landed
    val d1 = HealthPipeline.runOnce(spark, zone, wh, sources, LocalDate.parse("2024-01-20"))
    assert(d1.nonEmpty && d1.max <= "2024-01-19")
    val t1 = Writer.readTable(spark, wh)
    assert(t1.columns.toSet ==
      Set("day", "clicks__n", "clicks__total", "purchases__n", "purchases__total"))
    val n1 = t1.count()

    // same day again: nothing new to extract or append
    val d2 = HealthPipeline.runOnce(spark, zone, wh, sources, LocalDate.parse("2024-01-20"))
    assert(d2.isEmpty)
    assert(Writer.readTable(spark, wh).count() == n1)

    // a week later: only the new days land and append
    val d3 = HealthPipeline.runOnce(spark, zone, wh, sources, LocalDate.parse("2024-01-27"))
    assert(d3.nonEmpty && d3.min > d1.max && d3.max <= "2024-01-26")
    val t3 = Writer.readTable(spark, wh)
    assert(t3.count() == n1 + d3.size)

    // combined values match a direct aggregation of the source table
    val direct = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "click" && to_date(col("ts")) <= lit("2024-01-26"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val fromWh = t3.select($"day", $"clicks__n").filter($"clicks__n".isNotNull)
    val joined = fromWh.join(direct, Seq("day"))
      .filter($"clicks__n" === $"n")
    assert(joined.count() == direct.count())
  }
}
