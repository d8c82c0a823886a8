package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaOps
import graft.plans.OuterProductAgg

/** One-pass moment statistics + driver power iteration (SURVEY.md §2
  * row 168): brute-force parity, eigenstructure recovery on a known
  * anisotropic cloud, malformed-vector skipping, merge invariance. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entryIndex is a bijection onto the packed buffer") {
    val dim = 5
    val idxs = (for { i <- 0 to dim; j <- i to dim
                      if j == dim || i < dim }
      yield OuterProductAgg.entryIndex(i, j, dim)).toList
    assert(idxs.sorted == (0 until dim * (dim + 1) / 2 + dim + 1).toList, idxs)
  }

  test("moment rows match a brute-force local computation") {
    val vecs = (1 to 40).map(i =>
      Tuple1(Array(i * 0.01f, (i % 7) * 0.1f - 0.3f, -i * 0.02f)))
    val df = vecs.toDF("v")
    val got = PcaOps.momentRows(df, "v", dim = 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val q = vecs.map(t => t._1.map(x => math.floor(x.toDouble * 1000).toLong))
    for { i <- 0 until 3; j <- i until 3 } {
      val exp = q.map(x => x(i) * x(j)).sum
      assert(got((i.toLong, j.toLong)) == exp, s"P($i,$j)")
    }
    (0 until 3).foreach { i =>
      assert(got((i.toLong, 3L)) == q.map(_(i)).sum, s"M($i)")
    }
    assert(got((3L, 3L)) == 40L)
  }

  test("power iteration recovers a planted dominant direction") {
    // cloud stretched 10x along (1,1,0)/sqrt2, 1x along (1,-1,0)/sqrt2,
    // 0.1x along z — deterministic pseudo-random coefficients
    val dir1 = Array(math.sqrt(0.5), math.sqrt(0.5), 0.0)
    val dir2 = Array(math.sqrt(0.5), -math.sqrt(0.5), 0.0)
    val rows = (1 to 500).map { i =>
      def u(k: Int) = (((i * 2654435761L + k * 40503L) % 1000) / 500.0) - 1.0
      val (a, b, c) = (10.0 * u(1), 1.0 * u(2), 0.1 * u(3))
      Tuple1(Array(
        (a * dir1(0) + b * dir2(0)).toFloat,
        (a * dir1(1) + b * dir2(1)).toFloat,
        c.toFloat))
    }
    val pcs = PcaOps.fitPrincipalComponents(rows.toDF("v"), "v", dim = 3, n = 2)
    val (l1, v1) = pcs(0); val (l2, v2) = pcs(1)
    assert(l1 > l2 && l2 > 0, s"$l1, $l2")
    val cos1 = (0 until 3).map(k => v1(k) * dir1(k)).sum
    assert(math.abs(cos1) > 0.99, s"v1=${v1.mkString(",")}")
    // components are orthonormal
    val dot12 = (0 until 3).map(k => v1(k) * v2(k)).sum
    assert(math.abs(dot12) < 1e-6, s"dot=$dot12")
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("NULL and wrong-length vectors are skipped entirely") {
    val df = Seq(
      Some(Array(1.0f, 2.0f)), None, Some(Array(3.0f)), Some(Array(0.5f, -0.5f))
    ).toDF("v")
    val got = PcaOps.momentRows(df, "v", dim = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((2L, 2L)) == 2L, got.toString)   // only the two dim-2 rows
    assert(got((0L, 2L)) == 1000L + 500L, got.toString)
  }

  test("removing the top component kills its variance, preserves the rest") {
    val dir1 = Array(math.sqrt(0.5), math.sqrt(0.5), 0.0)
    val rows = (1 to 400).map { i =>
      def u(k: Int) = (((i * 2654435761L + k * 40503L) % 1000) / 500.0) - 1.0
      val (a, b) = (10.0 * u(1), 1.0 * u(2))
      Tuple1(Array((a * dir1(0) + b * 0.7071).toFloat,
        (a * dir1(1) - b * 0.7071).toFloat, (0.1 * u(3)).toFloat))
    }
    val df = rows.toDF("v")
    val pcs = PcaOps.fitPrincipalComponents(df, "v", dim = 3, n = 1)
    val whitened = PcaOps.removeComponents(df, "v", Seq(pcs.head._2))
      .as[Tuple1[Array[Double]]].collect().map(_._1)
    // residual projection onto the removed direction is ~0 per row
    val v1 = pcs.head._2
    whitened.foreach { w =>
      val p = (0 until 3).map(k => w(k) * v1(k)).sum
      assert(math.abs(p) < 1e-4, s"residual projection $p")
    }
    // the orthogonal b-direction variance survives (vectors not zeroed)
    assert(whitened.map(w => w.map(x => x * x).sum).max > 0.1)
  }

  test("statistics are invariant to partitioning (merge correctness)") {
    val df = (1 to 300).map(i =>
      Tuple1(Array.tabulate(8)(k => ((i * (k + 3)) % 17) * 0.05f))).toDF("v")
    val a = PcaOps.momentRows(df, "v", 8).orderBy($"i", $"j").collect().toSeq
    val b = PcaOps.momentRows(df.repartition(11), "v", 8)
      .orderBy($"i", $"j").collect().toSeq
    assert(a == b && a.size == 8 * 9 / 2 + 9)
  }
}
