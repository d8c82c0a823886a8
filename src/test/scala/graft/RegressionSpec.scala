package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Regression

/** One-pass normal equations + driver ridge solve (SURVEY.md §2 row
  * 167): exact recovery on noiseless linear data, Gram brute-force
  * parity, ridge shrinkage, NULL-as-zero, partitioning invariance. */
class RegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // y = 7 + 3*x1 - 2*x2 exactly, over a deterministic integer grid
  private def linear = (1 to 200).map { i =>
    val x1 = (i * 13 % 23).toLong; val x2 = (i * 7 % 11).toLong
    (x1, x2, 7L + 3L * x1 - 2L * x2)
  }.toDF("x1", "x2", "y")

  test("noiseless linear data is recovered exactly (lambda = 0)") {
    val beta = Regression.fitRidge(linear,
      Seq(lit(1L), $"x1", $"x2"), $"y")
    assert(math.abs(beta(0) - 7.0) < 1e-8, beta.mkString(","))
    assert(math.abs(beta(1) - 3.0) < 1e-8, beta.mkString(","))
    assert(math.abs(beta(2) + 2.0) < 1e-8, beta.mkString(","))
  }

  test("gram entries match a brute-force local computation") {
    val rows = linear.as[(Long, Long, Long)].collect()
    val g = Regression.normalEquations(linear, Seq(lit(1L), $"x1", $"x2"), $"y")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val xs = rows.map { case (x1, x2, y) => (Array(1L, x1, x2), y) }
    for { i <- 0 until 3; j <- i until 3 } {
      val exp = xs.map { case (x, _) => x(i) * x(j) }.sum
      assert(g((i.toLong, j.toLong)) == exp, s"G($i,$j)")
    }
    (0 until 3).foreach { i =>
      val exp = xs.map { case (x, y) => x(i) * y }.sum
      assert(g((i.toLong, 3L)) == exp, s"b($i)")
    }
  }

  test("ridge shrinks the coefficient-vector norm monotonically in lambda") {
    // Tikhonov guarantee: ||(G + λnI)^-1 b||₂ strictly decreases in λ
    // (per-coefficient monotonicity does NOT hold — coefficients can
    // trade off against the shrinking intercept)
    def norm(lambda: Double) = {
      val b = Regression.fitRidge(linear, Seq(lit(1L), $"x1", $"x2"), $"y", lambda)
      math.sqrt(b.map(x => x * x).sum)
    }
    val (n0, n1, n9) = (norm(0.0), norm(1.0), norm(100.0))
    assert(n1 < n0, s"$n0 -> $n1")
    assert(n9 < n1, s"$n1 -> $n9")
  }

  test("NULL features and targets contribute zero, not dropped rows") {
    val df = Seq((Some(2L), Some(10L)), (None, Some(4L)), (Some(3L), None))
      .toDF("x", "y")
    val g = Regression.normalEquations(df, Seq(lit(1L), $"x"), $"y")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(g((0L, 0L)) == 3L)                 // all three rows counted
    assert(g((1L, 1L)) == 4L + 0L + 9L)       // NULL x -> 0
    assert(g((1L, 2L)) == 20L + 0L + 0L)      // NULL y -> 0
  }

  test("statistics are invariant to input partitioning") {
    val a = Regression.normalEquations(linear, Seq(lit(1L), $"x1", $"x2"), $"y")
      .orderBy($"i", $"j").collect().toSeq
    val b = Regression.normalEquations(linear.repartition(17),
        Seq(lit(1L), $"x1", $"x2"), $"y")
      .orderBy($"i", $"j").collect().toSeq
    assert(a == b && a.size == 9)
  }
}
