package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dq, DqRule}

/** Row-level data-quality gate with quarantine (§2 row 150). */
class DqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame() = Seq[(Long, Option[String], Long)](
    (1L, Some("good"), 10L),
    (2L, Some(""), 10L),          // fails r_nonempty
    (3L, None, 10L),              // NULL pred -> violation (both rules on s)
    (4L, Some("good"), -5L),      // fails r_positive
    (5L, Some(""), -5L),          // fails both
  ).toDF("id", "s", "v")

  private val rules = Seq(
    DqRule("r_nonempty", length(col("s")) > 0),
    DqRule("r_positive", col("v") > 0L))

  test("NULL predicate quarantines: unprovable is not clean") {
    val got = Dq.tag(frame(), rules)
      .select(col("id"), array_join(col("dq_violations"), ",").as("vs"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "r_nonempty")
    assert(got(3L) == "r_nonempty")   // NULL length(s) -> violation
    assert(got(4L) == "r_positive")
    assert(got(5L) == "r_nonempty,r_positive") // declaration order
  }

  test("split is disjoint and exhaustive; clean drops gate columns") {
    val (clean, quar) = Dq.split(frame(), rules)
    val cleanIds = clean.select("id").as[Long].collect().toSet
    val quarIds = quar.select("id").as[Long].collect().toSet
    assert(cleanIds == Set(1L))
    assert(quarIds == Set(2L, 3L, 4L, 5L))
    assert((cleanIds & quarIds).isEmpty)
    assert(clean.columns.toSeq == Seq("id", "s", "v"))
    assert(quar.columns.contains("dq_violations"))
  }

  test("summary counts per rule over one aggregation") {
    val got = Dq.summary(frame(), rules)
      .select("rule", "n_rows", "n_viol", "viol_pct")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("r_nonempty", 5L, 3L, 60L),
      ("r_positive", 5L, 2L, 40L)))
  }

  test("writeGated lands both channels in one partitioned layout") {
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    Dq.writeGated(frame(), rules, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5)
    assert(back.filter(col("dq_ok") === "true").count() == 1)
    assert(back.filter(col("dq_ok") === "false").count() == 4)
    // partition pruning: reading one side scans only its directory
    assert(new java.io.File(dir, "dq_ok=true").exists())
    assert(new java.io.File(dir, "dq_ok=false").exists())
  }

  test("referential rule flags only keys present in the dim") {
    val dim = Seq("a", "b").toDF("k")
    val facts = Seq((1L, "a"), (2L, "c"), (3L, null.asInstanceOf[String]))
      .toDF("id", "src")
    val flagged = Dq.withRefFlag(facts, "src", dim, "k", "__ok")
    val got = Dq.tag(flagged, Seq(DqRule("r_ref", col("__ok").isNotNull)))
      .select(col("id"), col("dq_ok")).as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("a filter above the tag still pushes down to the parquet scan") {
    // the tag is a pure projection over input columns, so a predicate
    // on an input column must reach PushedFilters — the scaladoc claim
    val dir = java.nio.file.Files.createTempDirectory("dqpush").toString + "/t"
    frame().write.mode("overwrite").parquet(dir)
    val plan = Dq.tag(spark.read.parquet(dir), rules)
      .filter(col("v") > 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,0)]"),
      s"filter did not push past the DQ tag:\n$plan")
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Dq.tag(frame(), Seq(DqRule("r", lit(true)), DqRule("r", lit(false))))
    }
  }

  test("registered queries run and agree with each other") {
    val quar = Dq.quarantineQ(spark, TestSpark.sf)
      .as[(Long, String)].collect().toSeq
    assert(quar.nonEmpty)
    val summ = Dq.summaryQ(spark, TestSpark.sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(summ.map(_._1) == Seq(
      "r_min_len", "r_lang_allowed", "r_len_consistent", "r_source_known"))
    // per-rule counts re-derivable from the quarantine channel
    val fromQuar = quar.flatMap(_._2.split(",")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    summ.foreach { case (rule, _, nViol, _) =>
      assert(fromQuar.getOrElse(rule, 0L) == nViol, rule)
    }
  }
}
