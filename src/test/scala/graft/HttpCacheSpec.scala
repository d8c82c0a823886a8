package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HttpCache

/** HTTP cache revalidation planner (SURVEY.md §2 row 286): directive
  * parsing (incl. the s-maxage non-match), both freshness paths
  * (max-age and the 10% Last-Modified heuristic), and the verdict
  * ladder. */
class HttpCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Now = 1700000000L

  private def plan(rows: Seq[(String, Long, String, String, java.lang.Long)]) =
    HttpCache.revalidatePlan(
      rows.toDF("url", "fetched_at", "cc", "etag", "lm"),
      col("url"), col("fetched_at"), Now, col("cc"), col("etag"), col("lm"))
      .orderBy(col("url"))
      .as[(String, Long, Option[Long], Boolean, String)].collect().toSeq

  test("max-age freshness: within -> skip, past -> revalidate by best validator") {
    val got = plan(Seq(
      ("u1", Now - 100, "max-age=3600", null, null),              // fresh
      ("u2", Now - 4000, "max-age=3600", "\"e2\"", null),         // stale + etag
      ("u3", Now - 4000, "max-age=3600", null, Long.box(Now - 90000)), // stale + lm
      ("u4", Now - 4000, "max-age=3600", null, null)))            // stale, bare
    assert(got.map(r => (r._1, r._4, r._5)) == Seq(
      ("u1", true, "skip"), ("u2", false, "revalidate_etag"),
      ("u3", false, "revalidate_lm"), ("u4", false, "refetch")))
    assert(got.head._3 == Some(3600L) && got.head._2 == 100L)
  }

  test("no-store always refetches; no-cache forbids fresh even within max-age") {
    val got = plan(Seq(
      ("u1", Now - 10, "no-store, max-age=3600", "\"e\"", null),
      ("u2", Now - 10, "no-cache, max-age=3600", "\"e\"", null)))
    assert(got.map(_._5) == Seq("refetch", "revalidate_etag"))
    assert(got.forall(!_._4))
  }

  test("the 10% heuristic applies only without max-age; s-maxage is NOT max-age") {
    val lm = Long.box(Now - 1000 - 50000) // fetched 1000s ago, lm 50000s before that
    val got = plan(Seq(
      ("u1", Now - 1000, "", null, lm),             // age 1000 <= 5000 -> fresh
      ("u2", Now - 9000, "", null,
        Long.box(Now - 9000 - 50000)),              // age 9000 > 5000 -> stale
      ("u3", Now - 1000, "s-maxage=60", null, lm))) // s-maxage ignored -> heuristic
    assert(got.map(r => (r._1, r._3, r._5)) == Seq(
      ("u1", None, "skip"), ("u2", None, "revalidate_lm"), ("u3", None, "skip")))
  }

  test("no validators and no freshness signal -> refetch; clock skew clamps to 0") {
    val got = plan(Seq(
      ("u1", Now - 10, "", null, null),
      ("u2", Now - 10, null, null, Long.box(Now + 500)))) // lm in the future
    assert(got.map(_._5) == Seq("refetch", "revalidate_lm"))
    assert(!got(1)._4) // heuristic lifetime 0: not fresh
  }
}
