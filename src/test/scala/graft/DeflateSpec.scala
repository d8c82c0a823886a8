package graft

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.plans.DeflateLen

/** Compression-ratio quality signal (§2 row 108): kernel parity with a
  * reference Deflater, codegen/interpreted agreement, and the
  * boilerplate-vs-prose separation the cut exists for. */
class DeflateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refLen(s: String, level: Int): Int = {
    val d = new Deflater(level, true)
    try {
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](s.getBytes("UTF-8").length + 128)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  test("deflate_len matches a reference Deflater on varied inputs") {
    val inputs = Seq("", "a", "spam spam spam spam spam spam spam",
      "The quick brown fox jumps over the lazy dog.",
      "ünïcödé → ünïcödé → ünïcödé", "x" * 5000)
    val got = inputs.toDF("t")
      .select(DeflateLen.deflate_len($"t", 6)).as[Int].collect().toSeq
    assert(got == inputs.map(refLen(_, 6)))
  }

  test("codegen and interpreted evaluation agree") {
    val df = Seq("abc abc abc abc", "wholly distinct words here").toDF("t")
      .select(DeflateLen.deflate_len($"t", 6).as("l"))
    val whole = df.collect().map(_.getInt(0)).toSeq
    val interp = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(df.collect().map(_.getInt(0)).toSeq == whole)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", interp)
  }

  test("repetitive boilerplate scores a higher ratio than varied prose") {
    val rep = ("lorem ipsum dolor " * 60).trim
    val varied = (1 to 60).map(i => s"w${i}q${i * 7 % 97}").mkString(" ")
    val m = Seq((1L, rep), (2L, varied)).toDF("doc_id", "text")
      .select($"doc_id", (octet_length($"text").cast("double") /
        DeflateLen.deflate_len($"text", 6).cast("double")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) > 4.0, s"boilerplate ratio ${m(1L)} should exceed the cut")
    assert(m(2L) < m(1L) / 2, s"prose ${m(2L)} vs boilerplate ${m(1L)}")
  }

  test("q_compress_ratio emits one verdict per document") {
    val out = TextOps.compressRatioQ(spark, TestSpark.sf)
    val n = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(out.count() == n)
    assert(out.filter($"ratio" <= 0).count() == 0)
  }
}
