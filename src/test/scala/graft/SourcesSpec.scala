package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RawZone, Writer}

/** Landing-zone + warehouse-write mechanics (SURVEY.md §2.1 #1,#13). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("day", StringType)))

  def d(s: String): LocalDate = LocalDate.parse(s)

  test("RawZone round-trip with range pruning and overlap validation") {
    val root = Files.createTempDirectory("graft_zone").toString
    RawZone.write(Seq((1L, "2024-01-01"), (2L, "2024-01-03")).toDF("id", "day"),
      root, "hr", d("2024-01-01"), d("2024-01-07"))
    RawZone.write(Seq((3L, "2024-01-09")).toDF("id", "day"),
      root, "hr", d("2024-01-08"), d("2024-01-14"))

    val ranges = RawZone.listRanges(spark, root, "hr")
    assert(ranges.map(r => (r.start.toString, r.end.toString)) ==
      Seq(("2024-01-01", "2024-01-07"), ("2024-01-08", "2024-01-14")))

    // only the first window intersects the request
    val read = RawZone.readRange(spark, root, "hr", d("2024-01-02"), d("2024-01-05"), schema)
    assert(read.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // empty intersection -> empty frame, correct schema
    val none = RawZone.readRange(spark, root, "hr", d("2025-01-01"), d("2025-01-02"), schema)
    assert(none.count() == 0 && none.schema == schema)

    // landed inventory covers both windows
    assert(RawZone.landedDates(spark, root, "hr").size == 14)

    // overlapping window -> hard error on listing
    RawZone.write(Seq((4L, "2024-01-14")).toDF("id", "day"),
      root, "hr", d("2024-01-14"), d("2024-01-20"))
    assertThrows[RawZone.OverlappingRangesException] {
      RawZone.listRanges(spark, root, "hr")
    }
  }

  test("nextExtractionWindow: incremental and first-run backfill") {
    val root = Files.createTempDirectory("graft_zone2").toString
    // first run: 365-day backfill ending yesterday
    val Some((s0, e0)) = RawZone.nextExtractionWindow(spark, root, "hr", d("2024-02-01"))
    assert(e0 == d("2024-01-31") && s0 == e0.minusDays(RawZone.HistoricalDays))

    RawZone.write(Seq((1L, "2024-01-01")).toDF("id", "day"),
      root, "hr", d("2024-01-01"), d("2024-01-28"))
    val Some((s1, e1)) = RawZone.nextExtractionWindow(spark, root, "hr", d("2024-02-01"))
    assert(s1 == d("2024-01-29") && e1 == d("2024-01-31"))

    // up to date -> None
    assert(RawZone.nextExtractionWindow(spark, root, "hr", d("2024-01-29")).isEmpty)
  }

  test("chunkWindow steps exactly like the reference loop (8-day inclusive windows)") {
    // extract.py:137-149: chunk_end = min(start + 7 DAYS, end) — the
    // "7-day" chunk spans 8 inclusive days — then next = chunk_end + 1
    val chunks = RawZone.chunkWindow(d("2024-01-01"), d("2024-01-17"), 7)
    assert(chunks == Seq(
      (d("2024-01-01"), d("2024-01-08")),
      (d("2024-01-09"), d("2024-01-16")),
      (d("2024-01-17"), d("2024-01-17"))))
  }

  test("CSV round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/t"
    val df = Seq((1L, "a,b", 1.5), (2L, "plain", -0.25)).toDF("id", "s", "v")
    df.write.option("header", "true").csv(dir)
    val back = spark.read.schema(
        StructType(Seq(StructField("id", LongType), StructField("s", StringType),
          StructField("v", DoubleType))))
      .option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("Writer.appendByDay partitions by day and appends") {
    val path = Files.createTempDirectory("graft_wh").toString + "/t"
    Writer.appendByDay(Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "day"), path)
    Writer.appendByDay(Seq((3L, "2024-01-02")).toDF("id", "day"), path)
    val back = Writer.readTable(spark, path)
    assert(back.count() == 3)
    assert(Writer.existingDays(spark, path).as[String].collect().sorted.toSeq ==
      Seq("2024-01-01", "2024-01-02"))
    // day filter prunes partitions (physical plan lists only one dir)
    val pruned = back.filter(col("day") === "2024-01-02")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("2024-01-01"))
  }

  test("ORC round-trip keeps rows and day partitioning") {
    val path = Files.createTempDirectory("graft_orc").toString + "/t"
    val df = Seq((1L, 1.5, "2024-01-01"), (2L, 2.5, "2024-01-02"))
      .toDF("id", "v", "day")
    Writer.appendByDayOrc(df, path)
    val back = Writer.readOrc(spark, path)
    assert(back.count() == 2)
    assert(back.filter(col("day") === "2024-01-01").select("id").as[Long]
      .collect().toSeq == Seq(1L))
  }

  test("CSV round-trip keeps rows, TYPES (explicit schema) and day partitioning") {
    val path = Files.createTempDirectory("graft_csv").toString + "/t"
    val df = Seq((1L, 1.5, "2024-01-01"), (2L, 2.5, "2024-01-02"))
      .toDF("id", "v", "day")
    Writer.appendByDayCsv(df, path)
    val back = Writer.readCsv(spark, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    assert(back.count() == 2)
    // types survive: CSV without a schema would string both columns
    assert(back.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(back.filter(col("day") === "2024-01-02").select("v").as[Double]
      .collect().toSeq == Seq(2.5))

    // embedded newlines (document text) survive the quoted round-trip
    val path2 = Files.createTempDirectory("graft_csv2").toString + "/t"
    val text = "line one\nline two\nline three"
    Writer.appendByDayCsv(Seq((7L, text, "2024-01-01")).toDF("id", "text", "day"), path2)
    val back2 = Writer.readCsv(spark, path2,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    assert(back2.count() == 1)
    assert(back2.select("text").as[String].collect().head == text)
  }

  test("compact rewrites many small files into the computed target count") {
    val src = Files.createTempDirectory("graft_cmp").toString + "/src"
    val dst = Files.createTempDirectory("graft_cmp").toString + "/dst"
    // 64 tiny files
    spark.range(10000).repartition(64).write.parquet(src)
    val nIn = spark.read.parquet(src).inputFiles.length
    assert(nIn == 64)
    val planned = Writer.compact(spark, src, dst, targetBytes = 512L * 1024)
    val nOut = spark.read.parquet(dst).inputFiles.length
    assert(nOut == planned && nOut < nIn, s"in=$nIn out=$nOut planned=$planned")
    assert(spark.read.parquet(dst).count() == 10000)
  }
}
