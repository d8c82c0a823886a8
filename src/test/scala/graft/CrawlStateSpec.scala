package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CrawlState

/** Crawl-frontier state (SURVEY.md §2 row 262): max-day merge
  * semantics, replay idempotence, version advance, the three
  * frontier verdicts, and horizon boundary exactness. */
class CrawlStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    java.nio.file.Files.createTempDirectory("graft_cs").toString

  private def fetched(rows: (String, String, String)*) =
    rows.toSeq.toDF("url_canon", "host", "day")

  test("max-day merge: refetches advance, replays are idempotent") {
    val root = newRoot()
    assert(CrawlState.commitFetched(spark, fetched(
      ("u1", "h", "2025-01-10"), ("u2", "h", "2025-01-10")), root) == 0L)
    assert(CrawlState.commitFetched(spark, fetched(
      ("u1", "h", "2025-01-20")), root) == 1L)
    // a replay of an OLDER record must not regress the ledger
    CrawlState.commitFetched(spark, fetched(("u1", "h", "2025-01-10")), root)
    val led = CrawlState.ledger(spark, root)
      .as[(String, String, String)].collect().map { case (u, _, d) => u -> d }.toMap
    assert(led == Map("u1" -> "2025-01-20", "u2" -> "2025-01-10"))
  }

  test("frontier verdicts: new / recrawl / fresh with an exact horizon boundary") {
    val root = newRoot()
    CrawlState.commitFetched(spark, fetched(
      ("stale", "h", "2025-01-10"),   // +10 = 01-20 <= 01-25: recrawl
      ("edge", "h", "2025-01-15"),    // +10 = 01-25 <= 01-25: recrawl (boundary IN)
      ("fresh", "h", "2025-01-16")),  // +10 = 01-26 >  01-25: fresh
      root)
    val disc = Seq(("h", "stale"), ("h", "edge"), ("h", "fresh"), ("h", "never"))
      .toDF("host", "url_canon")
    val got = CrawlState.frontier(spark, disc, root, "2025-01-25", 10)
      .as[(String, String, String, String, Boolean)].collect()
      .map(r => r._2 -> ((r._4, r._5))).toMap
    assert(got == Map(
      "stale" -> (("recrawl", true)), "edge" -> (("recrawl", true)),
      "fresh" -> (("fresh", false)), "never" -> (("new", true))))
  }

  test("a sitemap lastmod newer than the fetch makes a URL changed, ahead of staleness") {
    val root = newRoot()
    CrawlState.commitFetched(spark, fetched(
      ("changed_fresh", "h", "2025-01-20"),  // lastmod after: changed, NOT stale
      ("changed_stale", "h", "2025-01-05"),  // changed AND stale: changed wins
      ("unchanged", "h", "2025-01-20"),      // lastmod BEFORE the fetch: fresh
      ("nolastmod", "h", "2025-01-20")), root)
    val disc = Seq(
      ("h", "changed_fresh", "2025-01-22"),
      ("h", "changed_stale", "2025-01-22"),
      ("h", "unchanged", "2025-01-15"),
      ("h", "nolastmod", ""))
      .toDF("host", "url_canon", "lastmod")
    val got = CrawlState.frontier(spark, disc, root, "2025-01-25", 10)
      .as[(String, String, String, String, String, Boolean)].collect()
      .map(r => r._2 -> ((r._5, r._6))).toMap
    assert(got == Map(
      "changed_fresh" -> (("changed", true)),
      "changed_stale" -> (("changed", true)),
      "unchanged" -> (("fresh", false)),
      "nolastmod" -> (("fresh", false))))
  }

  test("an untouched root makes every discovery new") {
    val got = CrawlState.frontier(spark,
        Seq(("h", "u1")).toDF("host", "url_canon"), newRoot(), "2025-01-25", 10)
      .as[(String, String, String, String, Boolean)].collect().toSeq
    assert(got == Seq(("h", "u1", "", "new", true)))
  }

  test("a live claim fences concurrent commits; half-written versions stay invisible") {
    val root = newRoot()
    CrawlState.commitFetched(spark, fetched(("u1", "h", "2025-01-10")), root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$root/_claim_v1"), false).close()
    intercept[java.util.ConcurrentModificationException] {
      CrawlState.commitFetched(spark, fetched(("u2", "h", "2025-01-11")), root)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_claim_v1"), false)
    // a version dir without _SUCCESS (a died committer) never resolves
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/fetched/v=1"))
    assert(CrawlState.ledger(spark, root).count() == 1L) // still v=0
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/fetched/v=1"), true)
    assert(CrawlState.commitFetched(spark,
      fetched(("u2", "h", "2025-01-11")), root) == 1L)
    assert(CrawlState.ledger(spark, root).count() == 2L)
  }

  test("frontier passes discovery columns through for the scheduler") {
    val root = newRoot()
    CrawlState.commitFetched(spark, fetched(("u1", "h", "2025-01-10")), root)
    val disc = Seq(("h", "u1", 800000L, 3L)).toDF(
      "host", "url_canon", "priority_ppm", "pos")
    val got = CrawlState.frontier(spark, disc, root, "2025-01-25", 10)
    assert(got.columns.toSeq ==
      Seq("host", "url_canon", "priority_ppm", "pos",
        "last_fetch_day", "status", "due"))
    assert(got.as[(String, String, Long, Long, String, String, Boolean)]
      .collect().head == (("h", "u1", 800000L, 3L, "2025-01-10", "recrawl", true)))
  }

  test("partitioning invariance of the merge") {
    val rows = (1 to 300).map(i =>
      (s"u${i % 40}", "h", f"2025-01-${i % 28 + 1}%02d"))
    val r1 = newRoot(); val r2 = newRoot()
    CrawlState.commitFetched(spark, rows.toDF("url_canon", "host", "day").repartition(1), r1)
    CrawlState.commitFetched(spark, rows.toDF("url_canon", "host", "day").repartition(13), r2)
    val a = CrawlState.ledger(spark, r1).as[(String, String, String)].collect().toSet
    val b = CrawlState.ledger(spark, r2).as[(String, String, String)].collect().toSet
    assert(a == b)
  }
}
