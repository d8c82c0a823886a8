package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.CdxSource

/** DSv2 CDX write/read connector (SURVEY.md §2 row 281): lossless
  * round trip, staged-commit visibility (no partials on failure),
  * truncate-on-overwrite, file-order preservation of a sorted write,
  * and the space-free field contract. */
class CdxSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("surt", "warc_date", "file", "rec_offset",
    "content_length", "digest", "url_canon")

  private def sample(n: Int) =
    (1 to n).map { i =>
      (f"com,site$i%03d)/p", s"2024-02-0${i % 9 + 1}T00:00:00Z",
        s"a$i.warc", i.toLong * 100, i.toLong, i.toLong * 7 - 3,
        s"https://site$i.com/p")
    }.toDF(cols: _*)

  private def newDir() =
    java.nio.file.Files.createTempDirectory("cdxsrc_spec").toString

  test("write -> read round trip is lossless") {
    val dir = newDir()
    sample(25).orderBy($"surt")
      .write.format("graft.sources.v2.CdxSource")
      .option("path", dir).mode("overwrite").save()
    val back = spark.read.format("graft.sources.v2.CdxSource")
      .option("path", dir).load()
    assert(back.schema == CdxSource.schema)
    assert(back.orderBy($"surt").collect().toSeq ==
      sample(25).orderBy($"surt").collect().toSeq)
  }

  test("overwrite truncates prior contents; append accumulates") {
    val dir = newDir()
    sample(10).write.format("graft.sources.v2.CdxSource")
      .option("path", dir).mode("overwrite").save()
    sample(10).write.format("graft.sources.v2.CdxSource")
      .option("path", dir).mode("overwrite").save()
    val read = () => spark.read.format("graft.sources.v2.CdxSource")
      .option("path", dir).load()
    assert(read().count() == 10)
    sample(10).write.format("graft.sources.v2.CdxSource")
      .option("path", dir).mode("append").save()
    assert(read().count() == 20)
  }

  test("a failed write leaves no visible rows (staged commit)") {
    val dir = newDir()
    sample(8).write.format("graft.sources.v2.CdxSource")
      .option("path", dir).mode("overwrite").save()
    import org.apache.spark.sql.functions._
    val boom = sample(8).withColumn("digest",
      when(col("rec_offset") > 400L,
        raise_error(lit("task failure")).cast("long")).otherwise(col("digest")))
    intercept[Exception] {
      boom.write.format("graft.sources.v2.CdxSource")
        .option("path", dir).mode("append").save()
    }
    val back = spark.read.format("graft.sources.v2.CdxSource")
      .option("path", dir).load()
    assert(back.count() == 8) // the prior table, untouched; no partials
    assert(!new java.io.File(dir, "_staging").exists ||
      new java.io.File(dir, "_staging").list().isEmpty)
  }

  test("a sorted write stays sorted across file boundaries on read") {
    val dir = newDir()
    sample(200).orderBy($"surt")
      .repartitionByRange(4, $"surt") // force multiple part files
      .sortWithinPartitions($"surt")
      .write.format("graft.sources.v2.CdxSource")
      .option("path", dir).mode("overwrite").save()
    val files = new java.io.File(dir).list().filter(_.startsWith("part-")).sorted
    assert(files.length == 4)
    // concatenating files in name order yields globally sorted surts
    val inFileOrder = files.toSeq.flatMap { f =>
      scala.io.Source.fromFile(new java.io.File(dir, f)).getLines().toSeq
    }.map(_.split(' ')(0))
    assert(inFileOrder == inFileOrder.sorted)
  }

  test("fields with spaces are rejected at write; malformed lines at read") {
    intercept[IllegalArgumentException] {
      CdxSource.formatLine("com,x)/a b", "d", "f", 0L, 0L, 0L, "u")
    }
    intercept[IllegalArgumentException] {
      CdxSource.parseLine("only three fields")
    }
  }

  test("a schema mismatch fails loudly at write planning") {
    val dir = newDir()
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("a", "b")
        .write.format("graft.sources.v2.CdxSource")
        .option("path", dir).mode("overwrite").save()
    }
    assert(e.getMessage != null)
  }
}
