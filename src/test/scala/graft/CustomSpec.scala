package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CustomOps
import graft.plans.RollingMinHash
import graft.sources.Tables

/** Custom Catalyst pieces: native expression + typed aggregator. */
class CustomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference: min over mix(hash of every k-gram), computed
    * the naive O(n*k) way. */
  private def referenceFingerprint(s: String, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) return Long.MaxValue
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d4ecda9226d4e9L
      z ^ (z >>> 31)
    }
    (0 to bytes.length - k).map { i =>
      var h = 0L
      var j = 0
      while (j < k) { h = h * RollingMinHash.Base + (bytes(i + j) & 0xff); j += 1 }
      mix(h)
    }.min
  }

  test("RollingMinHash matches the naive reference on the corpus") {
    val rows = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text",
        RollingMinHash.rolling_min_hash($"text", 8).as("fp"))
      .as[(Long, String, Long)].collect()
    rows.foreach { case (id, text, fp) =>
      assert(fp == referenceFingerprint(text, 8), s"doc $id")
    }
  }

  test("RollingMinHash interpreted eval agrees with the codegen path") {
    val texts = Tables.documents(spark, TestSpark.sf)
      .select($"text", RollingMinHash.rolling_min_hash($"text", 8).as("fp"))
      .as[(String, Long)].collect()
    texts.foreach { case (t, fp) =>
      val interp = RollingMinHash(
        org.apache.spark.sql.catalyst.expressions.Literal.create(t), 8).eval(null)
      assert(interp == fp)
    }
  }

  test("short input yields the sentinel") {
    assert(RollingMinHash.compute(UTF8String.fromString("abc"), 8) == Long.MaxValue)
  }

  test("graft_rolling_minhash is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_rolling_minhash('hello world, hello graft', 8) AS fp")
      .collect().head.getLong(0)
    assert(r == referenceFingerprint("hello world, hello graft", 8))
  }

  test("PolyHash64 interpreted eval agrees with the codegen path, and with the byte fold") {
    def reference(s: String): Long = {
      val bytes = s.getBytes("UTF-8")
      var h = 0L
      bytes.foreach(b => h = h * RollingMinHash.Base + (b & 0xff))
      // same splitmix64 as referenceFingerprint
      var z = h + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d4ecda9226d4e9L
      z ^ (z >>> 31)
    }
    val rows = Tables.documents(spark, TestSpark.sf)
      .select(explode(graft.functions.TextFunctions.tokens(lower($"text"))).as("tok"))
      .distinct()
      .select($"tok", graft.plans.PolyHash64.poly_hash64($"tok").as("h"))
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, h) =>
      assert(h == reference(t), s"token '$t'")
      val interp = graft.plans.PolyHash64(
        org.apache.spark.sql.catalyst.expressions.Literal.create(t)).eval(null)
      assert(interp == h, s"interpreted != codegen for '$t'")
    }
  }

  test("PolyHash64 rejects non-string input at analysis time") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3)
        .select(graft.plans.PolyHash64.poly_hash64($"id"))
        .collect()
    }
    assert(err.getMessage.contains("graft_poly_hash64"))
  }

  test("SmallestK sample matches the window formulation") {
    val viaAgg = CustomOps.samplePerGroupQ(spark, TestSpark.sf)
      .as[(String, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(md5($"text"), $"doc_id")
    val viaWindow = Tables.documents(spark, TestSpark.sf)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"lang", $"rn", $"doc_id")
      .orderBy($"lang", $"rn")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
