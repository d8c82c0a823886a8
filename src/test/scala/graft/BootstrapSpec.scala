package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Regression

/** Poisson bootstrap CI (SURVEY.md §2 row 303): the estimator is a
  * pure function of (data, pinned weight ladder), so the spec replays
  * the whole thing in plain Scala — weights, replicate means, order
  * statistics — and demands equality, plus the distribution-free
  * properties (partitioning invariance, rank semantics). */
class BootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def weightOf(b: Long, key: Long): Long = {
    val h = graft.plans.PolyHash64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"boot|$b|$key"))
    val u = java.lang.Math.floorMod(h, 1000000L)
    val i = Regression.BootCdfPpm.indexWhere(u < _)
    if (i < 0) Regression.BootCdfPpm.size.toLong else i.toLong
  }

  private lazy val df = (1L to 200L)
    .map(i => (if (i % 2 == 0) "a" else "z", i, (i % 17).toDouble + 0.25))
    .toDF("g", "k", "v")

  test("replicate means and CI ranks replay exactly from the pinned ladder") {
    val got = Regression.poissonBootstrapCi(df, col("g"), col("k"), col("v"),
        b = 8, loRank = 2, hiRank = 7)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val rows = (1L to 200L).map(i =>
      (if (i % 2 == 0) "a" else "z", i, math.floor((i % 17) + 0.25 * 100 + 0.5).toLong))
    // cents replay must match the engine's floor(v * 100 + 0.5)
    val cents = (1L to 200L).map(i =>
      (if (i % 2 == 0) "a" else "z", i,
        math.floor(((i % 17).toDouble + 0.25) * 100.0 + 0.5).toLong))
    for (g <- Seq("a", "z")) {
      val gr = cents.filter(_._1 == g)
      val means = (0L until 8L).flatMap { b =>
        val ws = gr.map { case (_, k, c) => (weightOf(b, k), c) }
        val rn = ws.map(_._1).sum
        if (rn > 0) Some(ws.map { case (w, c) => w * c }.sum.toDouble / rn.toDouble)
        else None
      }.sorted
      val point = gr.map(_._3).sum.toDouble / gr.size.toDouble
      val (p, lo, hi, n) = got(g)
      assert(n == 8L && p == point)
      assert(lo == means(1) && hi == means(6)) // ranks 2 and 7, 1-based
    }
  }

  test("the result is invariant under partitioning") {
    val a = Regression.poissonBootstrapCi(df, col("g"), col("k"), col("v"), b = 8, loRank = 2, hiRank = 7)
      .orderBy("g").collect().toSeq
    val b = Regression.poissonBootstrapCi(df.repartition(13, col("k")),
        col("g"), col("k"), col("v"), b = 8, loRank = 2, hiRank = 7)
      .orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("NULL values are excluded; degenerate rank bounds are rejected") {
    val withNull = df.unionAll(Seq(("a", 999L, null.asInstanceOf[java.lang.Double]))
      .map(t => (t._1, t._2, t._3: java.lang.Double)).toDF("g", "k", "v"))
    val a = Regression.poissonBootstrapCi(df, col("g"), col("k"), col("v"), b = 8, loRank = 2, hiRank = 7)
      .orderBy("g").collect().toSeq
    val b = Regression.poissonBootstrapCi(withNull, col("g"), col("k"), col("v"), b = 8, loRank = 2, hiRank = 7)
      .orderBy("g").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Regression.poissonBootstrapCi(df, col("g"), col("k"), col("v"),
        b = 8, loRank = 9, hiRank = 9)
    }
  }

  test("on a concentrated metric the CI brackets the point estimate") {
    // n = 100 rows per group: replicate means are tight around the
    // point mean; with the pinned hash this is deterministic — pin it
    val got = Regression.poissonBootstrapCi(df, col("g"), col("k"), col("v"), b = 40)
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(3),
        r.toString)
    }
  }
}
