package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fusion

/** Reciprocal rank fusion (§2.11). */
class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rank(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "doc_id", "rn")

  test("a doc on both lists outranks single-list docs near its ranks") {
    val sparse = rank((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
    val dense = rank((1L, 40L, 1L), (1L, 20L, 2L), (1L, 50L, 3L))
    val got = Fusion.rrfFuse(Seq(sparse, dense), topK = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    // doc 20: 1e6//62 twice = 32258; docs 10/40: 1e6//61 = 16393
    assert(got.head._2 == 20L && got.head._3 == 32258L)
    assert(got(1) == ((1L, 10L, 16393L, 2L)))  // tie vs 40 broken by doc_id
    assert(got(2) == ((1L, 40L, 16393L, 3L)))
  }

  test("fusing a single ranking preserves its order") {
    val r = rank((1L, 5L, 1L), (1L, 7L, 2L), (2L, 9L, 1L))
    val got = Fusion.rrfFuse(Seq(r), topK = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._4))
    assert(got.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq((1L, 5L, 1L), (1L, 7L, 2L), (2L, 9L, 1L)))
  }

  private def qrels(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "doc_id", "rel")

  test("retrievalEval: perfect ranking scores dcg == idcg, rank-1 first hit") {
    val labels = qrels((1L, 10L, 2L), (1L, 20L, 1L), (1L, 30L, 1L))
    // ranking in exactly ideal order (grade desc, doc_id tiebreak)
    val perfect = rank((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
    val got = Fusion.retrievalEval(perfect, labels, k = 10, ranker = "t")
      .as[(String, Long, Option[Long], Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, _, first, atK, total, dcg, idcg) = got.head
    assert(first.contains(1L) && atK == 3L && total == 3L && dcg == idcg)
    // dcg on the literal discount image: 3*1000000 + 1*630929 + 1*500000
    assert(dcg == 3L * 1000000L + 630929L + 500000L)
  }

  test("retrievalEval: a ranker that misses everything still reports its row") {
    val labels = qrels((1L, 10L, 2L), (2L, 40L, 1L))
    val miss = rank((1L, 99L, 1L), (1L, 98L, 2L))  // qid 2 absent entirely
    val got = Fusion.retrievalEval(miss, labels, k = 10, ranker = "t")
      .as[(String, Long, Option[Long], Long, Long, Long, Long)]
      .collect().sortBy(_._2)
    assert(got.length == 2)  // qrels spine drives output
    assert(got(0) == (("t", 1L, None, 0L, 1L, 0L, 3L * 1000000L)))
    assert(got(1) == (("t", 2L, None, 0L, 1L, 0L, 1000000L)))
  }

  test("retrievalEval: late hit ranks below k are excluded; partial recall counted") {
    val labels = qrels((1L, 10L, 1L), (1L, 20L, 1L))
    val r = rank((1L, 99L, 1L), (1L, 10L, 2L), (1L, 20L, 4L))
    val got = Fusion.retrievalEval(r, labels, k = 3, ranker = "t")
      .as[(String, Long, Option[Long], Long, Long, Long, Long)].collect()
    val (_, _, first, atK, total, dcg, idcg) = got.head
    assert(first.contains(2L) && atK == 1L && total == 2L)
    assert(dcg == 630929L)              // one grade-1 hit at rank 2
    assert(idcg == 1000000L + 630929L)  // both rels fit in ideal top-3
  }

  test("discount weights are the floor(1e6/log2(i+1)) image") {
    val w = (1 to 10).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    assert(Fusion.dcgWeights(10) == w && w.head == 1000000L && w(6) == 333333L)
  }

  test("hybrid query is deterministic and query-bounded") {
    def run() = Fusion.hybridRankQ(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val a = run()
    assert(a.nonEmpty && a == run())
    // 3 queries x top-10
    assert(a.map(_._1).distinct.size == 3 && a.size <= 30)
  }
}
