package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ClusterOps, SemDedup}
import graft.operators.ClusterOps.IntCentroid
import graft.sources.Tables

/** Distributed Lloyd k-means (SURVEY.md §2 row 113): model/assignment
  * determinism, floor-div parity with the oracle formula, the Lloyd
  * cost contract, empty-cluster semantics, and the projection-only
  * assignment plan. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)

  test("iters=0 assignment equals SemDedup.assignClusters (shared quantizer)") {
    val cents = ClusterOps.lloydCentroids(emb, "vec_id", "embedding", k = 8, iters = 0)
    val got = ClusterOps.assignKMeans(emb, "vec_id", "embedding", cents)
      .select($"vec_id".as("id"), $"cluster")
      .orderBy($"id").collect().toSeq
    val want = SemDedup.assignClusters(emb, "vec_id", "embedding",
        SemDedup.hashSeeds(emb, "vec_id", "embedding", 8))
      .select($"id", $"cluster").orderBy($"id").collect().toSeq
    assert(got == want)
  }

  test("Math.floorDiv matches the oracle's (s - pmod(s, n)) // n on both signs") {
    for (s <- Seq(-17L, -8L, -1L, 0L, 1L, 8L, 17L, -1000003L); n <- Seq(1L, 3L, 7L, 64L)) {
      val pmod = ((s % n) + n) % n
      assert(Math.floorDiv(s, n) == (s - pmod) / n, s"s=$s n=$n")
    }
  }

  test("two Lloyd iterations do not increase total within-cluster cost") {
    def cost(iters: Int): Long = {
      val cents = ClusterOps.lloydCentroids(emb, "vec_id", "embedding", k = 8, iters = iters)
      ClusterOps.assignKMeans(emb, "vec_id", "embedding", cents)
        .agg(sum($"d2")).head().getLong(0)
    }
    val c0 = cost(0); val c2 = cost(2)
    // floor-quantized means sit within 1 ulp-per-element of the true
    // mean, so the classic monotone-cost argument holds up to a
    // negligible rounding slack (d=64, elements at 1e6 scale)
    assert(c2 <= c0, s"cost went up: iters0=$c0 iters2=$c2")
  }

  test("model and assignment are invariant to input partitioning") {
    val shuffled = emb.repartition(7, $"label")
    val a = ClusterOps.lloydCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
    val b = ClusterOps.lloydCentroids(shuffled, "vec_id", "embedding", k = 4, iters = 2)
    assert(a == b)
    val ga = ClusterOps.assignKMeans(emb, "vec_id", "embedding", a)
      .orderBy($"vec_id").collect().toSeq
    val gb = ClusterOps.assignKMeans(shuffled, "vec_id", "embedding", b)
      .orderBy($"vec_id").collect().toSeq
    assert(ga == gb)
  }

  test("an emptied cluster drops from the model; assignment stays total") {
    // two tight blobs, k=3: whichever seed lands between them loses
    // all members after one update and must vanish from the model
    val pts = (0 until 20).map(i => (i.toLong, Seq(if (i < 10) 0f else 100f, 0f))) :+
      (20L, Seq(50f, 80f))
    val df = pts.toDF("vec_id", "embedding")
    val cents = ClusterOps.lloydCentroids(df, "vec_id", "embedding", k = 3, iters = 2)
    assert(cents.size <= 3)
    val assigned = ClusterOps.assignKMeans(df, "vec_id", "embedding", cents)
    assert(assigned.count() == 21) // every row keeps a cluster
    val used = assigned.select($"cluster").distinct().as[Long].collect().toSet
    assert(used.subsetOf(cents.map(_.cid).toSet))
  }

  test("assignment plan is projection-only: no exchange, no join") {
    val cents = Seq(IntCentroid(1L, Seq.fill(64)(0L)), IntCentroid(2L, Seq.fill(64)(1000L)))
    val p = ClusterOps.assignKMeans(emb, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }
}
