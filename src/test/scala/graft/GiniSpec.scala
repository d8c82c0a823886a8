package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Markup, Profiling}

/** Gini concentration (row 291) and the meta-robots gate (row 292). */
class GiniSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def g(xs: Seq[Long]) =
    Profiling.gini(xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v"), col("v"), col("id"))
      .as[(Long, Long, Long, Long, Option[Long])].collect().head

  test("gini: uniform mass is 0; a single holder is (n-1)/n") {
    assert(g(Seq(7L, 7L, 7L, 7L))._5 == Some(0L))
    val r = g(Seq(0L, 0L, 0L, 12L)) // n=4 -> G = 3/4
    assert(r._5 == Some(750000L))
  }

  test("gini: hand-computed mixed case and scale invariance") {
    // x = [1,2,3,4]: sum=10, sum i*x_i = 1+4+9+16 = 30
    // G = (2*30 - 5*10)/(4*10) = 10/40 = 0.25
    val r = g(Seq(1L, 2L, 3L, 4L))
    assert(r._3 == 10L && r._4 == 40L && r._5 == Some(250000L))
    assert(g(Seq(100L, 200L, 300L, 400L))._5 == Some(250000L))
  }

  test("gini: empty and all-zero frames yield NULL ppm, not a crash") {
    assert(g(Seq.empty)._5.isEmpty)
    assert(g(Seq(0L, 0L))._5.isEmpty)
  }

  test("gini is invariant to input partitioning") {
    val xs = (1 to 500).map(i => (i * 37 % 211).toLong)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val a = Profiling.gini(df, col("v"), col("id")).collect().toSeq
    val b = Profiling.gini(df.repartition(13), col("v"), col("id")).collect().toSeq
    assert(a == b)
  }

  private def rm(html: String, hdr: String) =
    Markup.robotsMeta(Seq((1L, html, hdr)).toDF("id", "html", "hdr"),
        col("id"), col("html"), col("hdr"))
      .as[(Long, String, Boolean, Boolean, String)].collect().head

  test("robots meta: both attribute orders, none, and word boundaries") {
    assert(rm("<head><meta name=\"robots\" content=\"noindex\"></head>", null)
      == ((1L, "noindex", false, true, "meta")))
    assert(rm("<head><meta content=\"nofollow\" name=\"robots\"></head>", null)
      == ((1L, "nofollow", true, false, "meta")))
    assert(rm("<head><meta name=\"robots\" content=\"none\"></head>", null)
      == ((1L, "none", false, false, "meta")))
    // 'noindexing' in prose must not deny
    val clean = rm("<body><p>on noindexing habits</p></body>", null)
    assert(clean._3 && clean._4 && clean._5 == "default")
  }

  test("robots meta: most restrictive wins across meta and header") {
    val r = rm("<head><meta name=\"robots\" content=\"all\"></head>", "noindex")
    assert(!r._3 && r._4 && r._5 == "header")
    val b = rm("<head><meta name=\"robots\" content=\"nofollow\"></head>",
      "noindex")
    assert(!b._3 && !b._4 && b._5 == "both")
  }
}
