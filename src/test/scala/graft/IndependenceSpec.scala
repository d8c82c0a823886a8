package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Categorical independence audit (SURVEY.md §2 row 205): the
  * perfectly-independent zero, a hand-computed 2×2, absent-cell
  * inclusion, the NULL class, marginal conservation, and partitioning
  * invariance. */
class IndependenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ind(rows: Seq[(Option[String], Option[String])], parts: Int = 1) =
    Profiling.independenceAudit(
        rows.toDF("a", "b").repartition(parts), "a", "b")
      .orderBy($"a", $"b")
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq

  test("a product distribution scores exactly zero on every cell") {
    val rows = for { a <- Seq("x", "y"); b <- Seq("p", "q", "r") }
      yield (Some(a), Some(b))
    val got = ind(rows)
    assert(got.size == 6 && got.forall(_._7 == 0d))
  }

  test("hand-computed 2x2: diagonal concentration") {
    // (x,p)=2 (y,q)=2, off-diagonal absent: n=4, all marginals 2
    // each cell term = (o·4 − 2·2)² / (4·2·2) = 16/16 = 1 for every cell
    val rows = Seq((Some("x"), Some("p")), (Some("x"), Some("p")),
      (Some("y"), Some("q")), (Some("y"), Some("q")))
    val got = ind(rows)
    assert(got.size == 4 && got.forall(_._7 == 1d))
    // absent cells appear with o = 0
    assert(got.count(_._3 == 0L) == 2)
  }

  test("NULL values form their own class") {
    val rows = Seq((None, Some("p")), (Some("x"), Some("p")))
    val got = ind(rows)
    assert(got.map(_._1).toSet == Set("__null__", "x"))
  }

  test("marginals conserve: row sums over cells equal row_n") {
    val rows = (1 to 200).map(i => (Some(s"a${i % 3}"), Some(s"b${i % 4}")))
    val got = ind(rows)
    got.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == cells.head._4)
    }
    assert(got.map(_._3).sum == 200L)
  }

  test("partitioning invariance") {
    val rows = (1 to 300).map(i =>
      (Some(s"a${(i * 7) % 5}"), if (i % 9 == 0) None else Some(s"b${i % 3}")))
    assert(ind(rows, parts = 1) == ind(rows, parts = 13))
  }
}
