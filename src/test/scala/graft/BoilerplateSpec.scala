package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate
import graft.sources.Tables

/** Frequent-segment (boilerplate) removal (§2.11). */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // line-structured fixture: "FOOTER" in 3 of 4 docs, "COOKIES" in 2,
  // unique content lines elsewhere
  private val docs = mk(
    1L -> "alpha content\nFOOTER\nmore alpha",
    2L -> "beta content\nCOOKIES\nFOOTER",
    3L -> "FOOTER\nCOOKIES\ngamma content",
    4L -> "delta content only",
  )
  private val segs = Boilerplate.lineSegments(col("text"))

  test("document frequency counts distinct docs, not occurrences") {
    val freq = Boilerplate.segmentFrequencies(
      mk(1L -> "X\nX\nX\nY", 2L -> "X\nZ"), col("doc_id"),
      Boilerplate.lineSegments(col("text")))
      .as[(String, Long)].collect().toMap
    assert(freq("X") == 2)  // 3 occurrences in doc 1 count once
    assert(freq("Y") == 1 && freq("Z") == 1)
  }

  test("scrub removes frequent lines in place, preserving order") {
    val freq = Boilerplate.segmentFrequencies(docs, col("doc_id"), segs)
    val boiler = Boilerplate.frequentSegments(freq, minDocs = 2)
    assert(boiler.select("segment").as[String].collect().toSet ==
      Set("FOOTER", "COOKIES"))
    val out = Boilerplate.scrubSegments(docs, col("doc_id"), segs, boiler)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "alpha content\nmore alpha", 1L)))
    assert(out(1) == ((2L, "beta content", 2L)))
    assert(out(2) == ((3L, "gamma content", 2L)))
    assert(out(3) == ((4L, "delta content only", 0L)))
  }

  test("a doc whose every line is boilerplate survives with empty text") {
    val all = docs.union(mk(5L -> "FOOTER\nCOOKIES\nFOOTER"))
    val boiler = Boilerplate.frequentSegments(
      Boilerplate.segmentFrequencies(all, col("doc_id"), segs), minDocs = 2)
    val out = Boilerplate.scrubSegments(all, col("doc_id"), segs, boiler)
      .filter($"id" === 5L).as[(Long, String, Long)].head()
    assert(out == ((5L, "", 3L)))
  }

  test("duplicate kept lines within a doc keep their multiplicity and order") {
    val d = mk(1L -> "a\nb\na\nc\na", 2L -> "c")
    val boiler = Boilerplate.frequentSegments(
      Boilerplate.segmentFrequencies(d, col("doc_id"),
        Boilerplate.lineSegments(col("text"))), minDocs = 2)  // only "c"
    val out = Boilerplate.scrubSegments(d, col("doc_id"),
        Boilerplate.lineSegments(col("text")), boiler)
      .filter($"id" === 1L).as[(Long, String, Long)].head()
    assert(out == ((1L, "a\nb\na\na", 1L)))
  }

  test("fixed-token segmentation is lossless on reassembly") {
    val real = Tables.documents(spark, TestSpark.sf).limit(50)
    val s2 = Boilerplate.fixedTokenSegments(col("text"), 3)
    // scrub with an EMPTY boilerplate set: reassembly must reproduce
    // the normalized text exactly (segment tail included)
    val empty = Seq.empty[String].toDF("segment")
    val back = Boilerplate.scrubSegments(real, col("doc_id"), s2, empty, sep = " ")
    val diff = back.join(real, back("id") === real("doc_id"))
      .filter($"text_clean" =!=
        lower(regexp_replace(trim($"text"), "\\s+", " ")))
      .count()
    assert(diff == 0)
  }

  test("result is partitioning-invariant") {
    val base = Tables.documents(spark, TestSpark.sf)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val s = Boilerplate.fixedTokenSegments(col("text"), 2)
      val b = Boilerplate.topSegments(
        Boilerplate.segmentFrequencies(df, col("doc_id"), s), 50)
      Boilerplate.scrubSegments(df, col("doc_id"), s, b, sep = " ")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(run(base) == run(base.repartition(13, $"lang")))
  }

  test("state-fed frequencies equal the direct count over all batches") {
    val base = Tables.documents(spark, TestSpark.sf)
    val segs2 = Boilerplate.fixedTokenSegments(col("text"), 2)
    val b1 = base.filter($"doc_id" % 3 === 0)
    val b2 = base.filter($"doc_id" % 3 === 1)
    val b3 = base.filter($"doc_id" % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("bp-state").toString + "/freq"
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      Boilerplate.appendFrequencies(b, col("doc_id"), segs2, dir, s"batch-$i") }
    val fed = Boilerplate.frequenciesFromState(spark, dir)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val direct = Boilerplate.segmentFrequencies(base, col("doc_id"), segs2)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(fed == direct)
    // a retried append of an existing batch must NOT double-count
    Boilerplate.appendFrequencies(b2, col("doc_id"), segs2, dir, "batch-1")
    val fed2 = Boilerplate.frequenciesFromState(spark, dir)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(fed2 == direct)
    // and the scrub driven from state matches the direct scrub
    val bFed = Boilerplate.topSegments(
      Boilerplate.frequenciesFromState(spark, dir), 50)
    val bDir = Boilerplate.topSegments(
      Boilerplate.segmentFrequencies(base, col("doc_id"), segs2), 50)
    def run(b: org.apache.spark.sql.DataFrame) =
      Boilerplate.scrubSegments(base, col("doc_id"), segs2, b, sep = " ")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(run(bFed) == run(bDir))
  }

  test("plan: boilerplate set broadcasts; scrub join is not a shuffle join") {
    val s = Boilerplate.fixedTokenSegments(col("text"), 2)
    val base = Tables.documents(spark, TestSpark.sf)
    val b = Boilerplate.topSegments(
      Boilerplate.segmentFrequencies(base, col("doc_id"), s), 50)
    val plan = Boilerplate.scrubSegments(base, col("doc_id"), s, b, sep = " ")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("LeftAnti"), s"scrub join must be an anti join:\n$plan")
  }
}
