package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Agreement

/** Cohen's kappa (SURVEY.md §2 row 172): hand-computed reference
  * values, the perfect/chance/worst anchor points, label-domain-union
  * marginals, the abstention contract, and partitioning invariance. */
class AgreementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kappa(rows: Seq[(String, String)], parts: Int = 1) = {
    val df = spark.createDataFrame(
      rows.map { case (a, b) => (Option(a), Option(b)) })
      .toDF("a", "b").repartition(parts)
    Agreement.cohenKappa(df, "a", "b")
      .as[(Long, Long, Long, Long, Long)].head()
  }

  test("hand-computed 2x2 example (Cohen 1960 shape)") {
    // contingency: yes/yes 20, yes/no 5, no/yes 10, no/no 15 → N=50
    // A=35, row marginals (25,25), col (30,20), E=25*30+25*20=1250
    // kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val (n, agree, e, num, den) = kappa(rows)
    assert((n, agree, e) == ((50L, 35L, 1250L)))
    assert((num, den) == ((500L, 1250L)))
  }

  test("perfect agreement: kappa_num == kappa_den > 0") {
    val (_, _, _, num, den) = kappa(Seq(("x", "x"), ("y", "y"), ("x", "x")))
    assert(num == den && den > 0)
  }

  test("statistically independent raters: kappa_num == 0") {
    // every (a,b) combination equally often → po == pe exactly
    val rows = for { a <- Seq("x", "y"); b <- Seq("x", "y") } yield (a, b)
    val (n, agree, e, num, _) = kappa(rows)
    assert(n == 4 && agree == 2 && e == 8 && num == 0)
  }

  test("disjoint label domains: agree == 0, kappa_num negative") {
    val (n, agree, e, num, den) = kappa(Seq(("x", "p"), ("y", "q")))
    assert(n == 2 && agree == 0)
    assert(e == 0, "no shared label → every marginal product has a 0 side")
    assert(num == 0 - 0 && num <= 0 && den == 4)
  }

  test("label used by only one rater still enters its own marginal") {
    // rater a uses {x,z}, rater b only {x}: z's row marginal meets a
    // zero column marginal → contributes 0; x row 1 * x col 2 = 2
    val (_, _, e, _, _) = kappa(Seq(("x", "x"), ("z", "x")))
    assert(e == 2)
  }

  test("NULL on either side is abstention, excluded from n") {
    val df = Seq((Some("x"), Some("x")), (None, Some("x")),
      (Some("y"), None), (None, None))
      .toDF("a", "b")
    val (n, agree, _, _, _) =
      Agreement.cohenKappa(df, "a", "b").as[(Long, Long, Long, Long, Long)].head()
    assert(n == 1 && agree == 1)
  }

  test("empty input yields the explicit undefined row (all zeros)") {
    val (n, agree, e, num, den) = kappa(Seq.empty)
    assert((n, agree, e, num, den) == ((0L, 0L, 0L, 0L, 0L)))
  }

  private def alpha(rows: Seq[(Long, String)], maxRaters: Int = 4) =
    Agreement.krippendorffAlpha(
        spark.createDataFrame(rows.map { case (u, v) => (u, Option(v)) })
          .toDF("u", "v"),
        "u", "v", maxRaters)
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Double])].head()

  test("alpha hand cases: perfect 1, chance-level 0, systematic -1/2") {
    // perfect: two units, each internally unanimous
    val p = alpha(Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")), maxRaters = 2)
    assert(p._8 == Some(1.0) && p._3 == 0L)
    // u1 {a,a}, u2 {a,b}: DoL=2, n=4, De'=6 -> alpha = (6-3*2)/6 = 0
    val c = alpha(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")), maxRaters = 2)
    assert(c._6 == 0L && c._8 == Some(0.0))
    // both units split {a,b}: alpha = (8-3*4)/8 = -0.5
    val w = alpha(Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")), maxRaters = 2)
    assert(w._8 == Some(-0.5))
  }

  test("alpha: singleton units and NULL ratings are excluded everywhere") {
    val base = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
    val withNoise = base ++ Seq((3L, "b"), (4L, null.asInstanceOf[String]))
    val (b, n) = (alpha(base, 2), alpha(withNoise, 2))
    assert(b == n, "a 1-rating unit and a NULL rating must change nothing")
    assert(b._1 == 2L, "n_units counts only m>=2 units")
  }

  test("alpha: one label value everywhere -> NULL (no chance disagreement)") {
    val r = alpha(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")), maxRaters = 2)
    assert(r._5 == 0L && r._8.isEmpty)
  }

  test("alpha is invariant to the maxRaters LCM scale") {
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"))
    val a4 = alpha(rows, maxRaters = 4)
    val a8 = alpha(rows, maxRaters = 8)
    assert(a4._8 == a8._8)
    assert(a4._6 * a8._7 == a8._6 * a4._7, "the (num, den) ratio is L-invariant")
  }

  test("partitioning invariance") {
    val rows = (1 to 97).map(i => (s"l${i % 3}", s"l${i % 4 % 3}"))
    assert(kappa(rows, 1) == kappa(rows, 13))
  }
}
