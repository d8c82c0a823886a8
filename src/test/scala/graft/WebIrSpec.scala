package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WebIr

/** Web-IR link signals (SURVEY.md §2 rows 266–269): anchor mode with
  * deterministic tie-break, co-citation pair counts, integer HITS
  * (normalization, dominance, partitioning invariance), and bounded
  * redirect resolution with cycle flagging. */
class WebIrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000L

  test("anchor aggregation: counts, distinct sources, mode with lexicographic tie-break") {
    val links = Seq(
      (1L, "u1", "docs"), (2L, "u1", "docs"), (3L, "u1", "home"),
      (3L, "u1", "home"), // same doc links u1 twice with 'home': ties 2-2
      (1L, "u2", "b"), (2L, "u2", "a"))
      .toDF("src", "url", "anchor")
    val got = WebIr.anchorAggregate(links, "url", "anchor", "src")
      .orderBy("url")
      .as[(String, Long, Long, Long, String, Long)].collect().toSeq
    // u1: 4 inlinks from 3 docs, anchors {docs, home} tied 2-2 -> 'docs'
    // u2: 1-1 tie between 'a' and 'b' -> 'a'
    assert(got == Seq(
      ("u1", 4L, 3L, 2L, "docs", 2L),
      ("u2", 2L, 2L, 2L, "a", 1L)))
  }

  test("co-citation: same-source pairs, canonical order, duplicate links collapse") {
    val links = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"), // dup (1,a) collapses
      (2L, "a"), (2L, "b"),
      (3L, "c"))
      .toDF("src", "url")
    val got = WebIr.coCitation(links, "src", "url")
      .orderBy("url_a", "url_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("co-citation: a link-farm source past maxOutDegree contributes no pairs") {
    // src 9 links 5 distinct urls (> cap 4) -> excluded ENTIRELY;
    // srcs 1 and 2 (degree <= cap) still pair as before
    val links = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++
      (0 until 5).map(i => (9L, s"farm$i"))
    val got = WebIr.coCitation(links.toDF("src", "url"), "src", "url",
        maxOutDegree = 4)
      .orderBy("url_a", "url_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L)))
    // at the default cap the farm is tiny and pairs normally
    val all = WebIr.coCitation(links.toDF("src", "url"), "src", "url")
    assert(all.count() == 1L + 10L) // (a,b) + C(5,2) farm pairs
  }

  test("bib coupling: sources sharing targets pair; a mega-target past the cap is mute") {
    val links = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "y")) ++
      (1L to 6L).map(s => (s, "cdn-asset")) // in-degree 6 > cap 5
    val got = WebIr.bibCoupling(links.toDF("src", "url"), "src", "url",
        maxInDegree = 5)
      .orderBy("src_a", "src_b")
      .as[(Long, Long, Long)].collect().toSeq
    // (1,2) share x and y; (1,3)/(2,3) share y; cdn-asset adds NOTHING
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("host graph: registered-domain rollup, intra-domain drop, unknown fold") {
    import org.apache.spark.sql.functions.col
    val edges = Seq(
      ("https://www.a.com/p/1", "https://B.co.uk/x"),   // a.com -> b.co.uk
      ("https://sub.a.com/p/2", "https://b.co.uk/y"),   // same collapsed edge
      ("https://www.a.com/p/3", "https://a.com/nav"),   // intra-domain: dropped
      ("https://a.com/p/4", "http://weird.invalidtld/z")) // unknown dst
      .toDF("s", "t")
    val got = WebIr.hostGraph(edges, col("s"), col("t"))
      .orderBy("src_domain", "dst_domain")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a.com", "b.co.uk", 2L), ("a.com", "unknown", 1L)))
  }

  test("group k-fold: every group's rows land in exactly one fold") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 300).map(i => (i.toLong, s"g${i % 23}")).toDF("id", "g")
    val folds = graft.operators.TrainingOps.assignGroupFolds(df, col("g"), 5)
    val perGroup = folds.groupBy("g")
      .agg(org.apache.spark.sql.functions.countDistinct(col("fold")).as("nf"))
      .as[(String, Long)].collect()
    assert(perGroup.forall(_._2 == 1L))
    // and the folds genuinely spread (not all groups in one fold)
    assert(folds.select("fold").distinct().count() >= 3)
  }

  test("hits: symmetric bipartite graph gives equal hubs and equal authorities") {
    // 2 hubs each linking the same 2 authorities
    val e = Seq((0L, 1L), (0L, 3L), (2L, 1L), (2L, 3L)).toDF("s", "d")
    val got = WebIr.hits(e, "s", "d", iters = 2)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got(0)._2 == got(2)._2 && got(0)._2 > 0)
    assert(got(1)._3 == got(3)._3 && got(1)._3 > 0)
    // pure hubs have auth 0; pure authorities have hub 0
    assert(got(0)._3 == 0 && got(1)._2 == 0)
    // each normalized side sums to ~scale (floor truncation only)
    assert(math.abs(got.map(_._2).sum - Scale) < 4)
    assert(math.abs(got.map(_._3).sum - Scale) < 4)
  }

  test("hits: the authority every hub links out-ranks a single-inlink one") {
    val e = Seq((0L, 10L), (2L, 10L), (4L, 10L), (4L, 12L)).toDF("s", "d")
    val got = WebIr.hits(e, "s", "d", iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(10L)._3 > got(12L)._3)
    // the hub linking BOTH authorities out-ranks the single-link hubs
    assert(got(4L)._2 > got(0L)._2)
  }

  test("hits scores are invariant to edge partitioning") {
    val e = Seq((0L, 1L), (0L, 3L), (2L, 3L), (4L, 1L), (4L, 5L)).toDF("s", "d")
    val a = WebIr.hits(e, "s", "d", iters = 2).orderBy("node").collect().toSeq
    val b = WebIr.hits(e.repartition(7, $"d"), "s", "d", iters = 2)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("redirects: direct alias, 2-hop chain, and a cycle that flags") {
    val r = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")).toDF("f", "t")
    val got = WebIr.resolveRedirects(r, "f", "t", maxHops = 4)
      .orderBy("url").as[(String, String, Long, Boolean)].collect().toSeq
    assert(got(0) == ("a", "c", 2L, false))
    assert(got(1) == ("b", "c", 1L, false))
    // the 2-cycle burns all 4 hops and still points at a redirector
    assert(got(2)._1 == "x" && got(2)._3 == 4L && got(2)._4)
    assert(got(3)._1 == "y" && got(3)._4)
  }

  test("redirects: a chain exactly at the hop cap resolves; one past it flags") {
    val r = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")).toDF("f", "t")
    val got = WebIr.resolveRedirects(r, "f", "t", maxHops = 4)
      .as[(String, String, Long, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(got("1") == ("1", "5", 4L, false))   // 4 hops, lands on non-redirector
    assert(got("2") == ("2", "5", 3L, false))
  }

  test("hits rejects iters < 1") {
    val e = Seq((0L, 1L)).toDF("s", "d")
    intercept[IllegalArgumentException] {
      WebIr.hits(e, "s", "d", iters = 0)
    }
  }
}
