package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stitch

/** Split-document stitching (SURVEY.md §2 row 192): boundary overlap
  * detection, direction, the w window, short-doc exclusion, chains,
  * and partitioning invariance. */
class StitchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def st(docs: Seq[(Long, String)], w: Int = 3, parts: Int = 1) =
    Stitch.stitchCandidates(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", w)
      .orderBy($"id_a", $"id_b")
      .as[(Long, Long, String)].collect().toSeq

  test("a split pair matches tail-to-head, directionally") {
    val docs = Seq(
      (1L, "page one ends with alpha beta gamma"),
      (2L, "alpha beta gamma continues page two"))
    assert(st(docs) == Seq((1L, 2L, "alpha beta gamma")))
  }

  test("no match when the shared tokens are not at the boundaries") {
    val docs = Seq(
      (1L, "alpha beta gamma page one ends"),     // shared run at HEAD of 1
      (2L, "page two has alpha beta gamma inside x"))
    assert(st(docs) == Seq.empty)
  }

  test("window width is exact: w+1 tokens shared, only last w count") {
    val docs = Seq(
      (1L, "x y alpha beta gamma"),
      (2L, "beta gamma delta z w"))   // tail(1) != head(2) at w=3
    assert(st(docs) == Seq.empty)
    assert(st(docs, w = 2) == Seq((1L, 2L, "beta gamma")))
  }

  test("docs shorter than w are excluded, never partially matched") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta gamma longer doc"))
    assert(st(docs, w = 3) == Seq.empty)
  }

  test("a three-way chain yields two directed pairs") {
    val docs = Seq(
      (1L, "start body k1 k2 k3"),
      (2L, "k1 k2 k3 middle k4 k5 k6"),
      (3L, "k4 k5 k6 tail end done"))
    assert(st(docs).map(r => (r._1, r._2)) == Seq((1L, 2L), (2L, 3L)))
  }

  test("case folds and punctuation is transparent at the boundary") {
    val docs = Seq((1L, "ends with Alpha, Beta! Gamma"),
      (2L, "alpha beta gamma goes on here"))
    assert(st(docs) == Seq((1L, 2L, "alpha beta gamma")))
  }

  test("partitioning invariance") {
    val docs = (1L to 50L).map { i =>
      if (i % 10 == 0) (i, s"body w$i ends br$i one two")
      else if (i % 10 == 1) (i, s"br${i - 1} one two starts w$i body")
      else (i, s"plain w$i content here nothing shared")
    }
    assert(st(docs, parts = 1) == st(docs, parts = 13))
  }
}
