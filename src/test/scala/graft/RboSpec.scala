package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fusion

/** Rank-biased overlap (SURVEY.md §2 row 308): the suffix-weight
  * collapse must equal the per-depth definition, identical lists score
  * exactly 1, and the top-weighting property (the reason RBO exists)
  * holds. */
class RboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranking(qid: Long, docs: Seq[Long]) =
    docs.zipWithIndex.map { case (d, i) => (qid, d, (i + 1).toLong) }

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("qid", "doc_id", "rn")

  private def rboOf(a: Seq[Long], b: Seq[Long], depth: Int = 8): (Long, Long) = {
    val r = Fusion.rboOverlap(df(ranking(1L, a)), df(ranking(1L, b)), depth)
      .head()
    (r.getLong(1), r.getLong(2))
  }

  /** The definition, directly: Σ_d w_d·|A_d ∩ B_d| with the same
    * integer weight table. */
  private def brute(a: Seq[Long], b: Seq[Long], depth: Int): Long = {
    val (suffix, _) = Fusion.rboWeights(depth)
    val w = (0 until depth).map(i =>
      suffix(i) - (if (i + 1 < depth) suffix(i + 1) else 0L))
    (1 to depth).map { d =>
      w(d - 1) * a.take(d).toSet.intersect(b.take(d).toSet).size.toLong
    }.sum
  }

  test("suffix-weight collapse equals the per-depth definition") {
    val cases = Seq(
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(1L, 2L, 3L, 4L, 5L)),
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(5L, 4L, 3L, 2L, 1L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L), Seq(2L, 1L, 4L, 3L, 6L, 5L, 8L, 7L)),
      (Seq(1L, 2L), Seq(2L, 3L, 1L)))
    for ((a, b) <- cases) {
      val (num, _) = rboOf(a, b)
      assert(num == brute(a, b, 8), s"$a vs $b")
    }
  }

  test("identical depth-D lists score exactly 1; disjoint lists exactly 0") {
    val full = (1L to 8L).toSeq
    val (num, den) = rboOf(full, full)
    assert(num == den)
    val (z, _) = rboOf(Seq(1L, 2L, 3L), Seq(7L, 8L, 9L))
    assert(z == 0L)
  }

  test("top-weighted: a swap at the top costs more than the same swap at the bottom") {
    val base = (1L to 8L).toSeq
    val topSwap = Seq(2L, 1L) ++ (3L to 8L)
    val botSwap = (1L to 6L) ++ Seq(8L, 7L)
    val (nTop, _) = rboOf(base, topSwap)
    val (nBot, _) = rboOf(base, botSwap)
    assert(nTop < nBot, s"top=$nTop bot=$nBot")
  }

  test("queries seen by only one ranker report rbo_num = 0, not a dropped row") {
    val a = df(ranking(1L, Seq(1L, 2L)) ++ ranking(2L, Seq(3L, 4L)))
    val b = df(ranking(1L, Seq(1L, 2L)))
    val got = Fusion.rboOverlap(a, b, 8).orderBy("qid").collect()
    assert(got.length == 2 && got(1).getLong(1) == 0L)
  }
}
