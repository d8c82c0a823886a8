package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multivariate linear regression via one-pass normal equations
  * (SURVEY.md §2 row 167) — the closed-form fit pipelines use to
  * calibrate quality scores and fit data-mixing/scaling-law curves:
  * β = (XᵀX + λI)⁻¹ Xᵀy. Row 147's per-group trend is the k=2
  * special case; this is the general small-k form.
  *
  * The decomposition that makes it scale: XᵀX and Xᵀy are SUFFICIENT
  * STATISTICS — k(k+1)/2 + k sums of per-row integer products — so
  * the corpus contributes ONE aggregation pass (no gradient loop, no
  * per-iteration scans, no shuffle beyond the single global agg's
  * partial-merge), and the k×k solve happens on the k²-bounded driver
  * model (the Lloyd-partials posture; k is feature count, never
  * corpus-sized). Products accumulate in DECIMAL(38,0): integer
  * features at 100 TB (x ~ 1e5, x² ~ 1e10, × 1e12 rows ~ 1e22) wrap
  * a long but fit 38 digits; the emitted entries cast back to BIGINT
  * under the documented |G_ij| < 2^63 contract (pre-scale features
  * if heavier).
  *
  * Exactness: the statistics are pure integer sums — DuckDB replays
  * them verbatim (the oracle-backed surface). The SOLVE is driver-side
  * double Gaussian elimination — deterministic but floating-point, so
  * it is spec-verified (exact-recovery + shrinkage pins), not
  * oracle-hashed: the engine/oracle boundary is the sufficient
  * statistics, the same contract as k-means (assignment projection
  * oracle-exact, centroid doubles spec-pinned).
  */
object Regression {

  /** The packed sufficient statistics: one row per (i, j) with
    * 0 <= i <= j < k for G = Σ x xᵀ (upper triangle — G is symmetric)
    * plus j = k rows for b_i = Σ x_i·y. Feature expressions must be
    * integer-valued; NULLs count as 0 (presence discipline: a NULL
    * feature is a zero contribution, not a dropped row). */
  def normalEquations(df: DataFrame, features: Seq[Column], target: Column): DataFrame = {
    require(features.nonEmpty, "at least one feature required")
    val k = features.size
    val xs = features.zipWithIndex.map { case (f, i) =>
      coalesce(f.cast(LongType), lit(0L)).as(s"__x$i")
    }
    val y = coalesce(target.cast(LongType), lit(0L)).as("__y")
    val proj = df.select(xs :+ y: _*)
    val entries =
      (for { i <- 0 until k; j <- i until k } yield (i, j,
        sum(expr(s"CAST(__x$i AS DECIMAL(38,0)) * __x$j")))) ++
      (0 until k).map(i => (i, k,
        sum(expr(s"CAST(__x$i AS DECIMAL(38,0)) * __y"))))
    val agg = proj.agg(entries.head._3.as("__s0"),
      entries.tail.zipWithIndex.map { case ((_, _, c), n) => c.as(s"__s${n + 1}") }: _*)
    // unpivot the 1-row aggregate into (i, j, g) rows — a k²-bounded
    // literal stack, not a shuffle
    val stackExpr = entries.zipWithIndex
      .map { case ((i, j, _), n) => s"${i}L, ${j}L, CAST(__s$n AS BIGINT)" }
      .mkString(s"stack(${entries.size}, ", ", ", ") AS (i, j, g)")
    agg.select(expr(stackExpr))
  }

  /** Driver-side ridge solve from collected statistics: Gaussian
    * elimination with partial pivoting on (G + λ·n·I)β = b, where the
    * λ scaling by n = G(0,0) (when feature 0 is the intercept's 1)
    * makes the shrinkage strength corpus-size-invariant. */
  def solve(gram: Map[(Int, Int), Long], k: Int, lambda: Double): Array[Double] = {
    val n = gram.getOrElse((0, 0), 1L).toDouble.max(1.0)
    val a = Array.tabulate(k, k + 1) { (i, j) =>
      if (j == k) gram.getOrElse((i, k), 0L).toDouble
      else {
        val base = gram.getOrElse((math.min(i, j), math.max(i, j)), 0L).toDouble
        if (i == j) base + lambda * n else base
      }
    }
    for (c <- 0 until k) {
      val p = (c until k).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(p); a(p) = t
      require(math.abs(a(c)(c)) > 1e-12, s"singular system at column $c")
      for (r <- 0 until k if r != c) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c to k) a(r)(j) -= f * a(c)(j)
      }
    }
    Array.tabulate(k)(i => a(i)(k) / a(i)(i))
  }

  /** One-call fit: aggregate the statistics (one distributed pass),
    * collect the k²-bounded model, solve on the driver. */
  def fitRidge(df: DataFrame, features: Seq[Column], target: Column,
               lambda: Double = 0.0): Array[Double] = {
    val k = features.size
    val g = normalEquations(df, features, target)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    solve(g, k, lambda)
  }

  /** §2 row 167 — sufficient statistics for predicting n_chars from
    * [1, token count, digit count, whitespace count] over `documents`. */
  def normalEqQ(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    normalEquations(doc,
      Seq(lit(1L),
        size(expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).cast(LongType),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast(LongType),
        (length(col("text")) - length(regexp_replace(col("text"), "\\s", ""))).cast(LongType)),
      col("n_chars"))
      .orderBy(col("i"), col("j"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_normal_eq" -> (normalEqQ _),
  )

  val oracles: Map[String, String] = Map(
    // the same integer products summed in HUGEINT, unpivoted by a
    // UNION ALL of the k(k+1)/2 + k single-row aggregates
    "q_normal_eq" -> {
      val feats = Seq(
        "1",
        "len(regexp_extract_all(text, '[A-Za-z0-9]+', 0))",
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))",
        "length(text) - length(regexp_replace(text, '\\s', '', 'g'))")
      val k = feats.size
      val fcols = feats.zipWithIndex
        .map { case (f, i) => s"CAST(COALESCE($f, 0) AS HUGEINT) AS x$i" }
        .mkString(", ")
      val rows =
        (for { i <- 0 until k; j <- i until k } yield
          s"SELECT CAST($i AS BIGINT) AS i, CAST($j AS BIGINT) AS j, CAST(SUM(x$i * x$j) AS BIGINT) AS g FROM f") ++
        (0 until k).map(i =>
          s"SELECT CAST($i AS BIGINT) AS i, CAST($k AS BIGINT) AS j, CAST(SUM(x$i * y) AS BIGINT) AS g FROM f")
      s"""WITH f AS (
         |  SELECT $fcols, CAST(COALESCE(n_chars, 0) AS HUGEINT) AS y
         |  FROM documents)
         |${rows.mkString("\n", "\nUNION ALL\n", "\n")}
         |ORDER BY i, j""".stripMargin
    },
  )
}
