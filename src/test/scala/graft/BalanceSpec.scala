package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Class-balance audit (SURVEY.md §2 row 198): hand-computed Gini
  * fraction, the NULL class, majority/minority tie-breaks, the
  * single-class and uniform anchors, and partitioning invariance. */
class BalanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bal(rows: Seq[(Option[String], String)], parts: Int = 1) =
    Profiling.classBalance(rows.toDF("a", "b").repartition(parts), Seq("a", "b"))
      .orderBy($"dim")
      .as[(String, Long, Long, String, Long, String, Long, Long, Long)]
      .collect().toSeq

  test("hand-computed Gini and argmax/argmin on a 3-2-1 split") {
    // a: x,x,x,y,y,NULL → n=6, k=3, Σc²=9+4+1=14, gini=(36-14)/36
    val rows = Seq(Some("x") -> "p", Some("x") -> "p", Some("x") -> "p",
      Some("y") -> "p", Some("y") -> "p", None -> "p")
    val a = bal(rows).head
    assert(a == (("a", 6L, 3L, "x", 3L, "__null__", 1L, 22L, 36L)))
    // b: single class → gini 0, majority == minority
    val b = bal(rows).last
    assert(b == (("b", 6L, 1L, "p", 6L, "p", 6L, 0L, 36L)))
  }

  test("majority ties break to the largest value, minority to the smallest") {
    val rows = Seq(Some("m") -> "z", Some("q") -> "z")
    val a = bal(rows).head
    assert(a._4 == "q" && a._6 == "m")
  }

  test("uniform k classes give gini (k-1)/k") {
    val rows = (1 to 4).map(i => Some(s"c$i") -> "z")
    val a = bal(rows).head
    // n=4, Σc²=4 → (16-4)/16 = 12/16 = (k-1)/k
    assert(a._8 == 12L && a._9 == 16L)
  }

  test("partitioning invariance") {
    val rows = (1 to 500).map(i =>
      (if (i % 11 == 0) None else Some(s"v${i % 7}"), s"w${i % 3}"))
    assert(bal(rows, parts = 1) == bal(rows, parts = 13))
  }
}
