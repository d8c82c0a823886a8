package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, VectorOps}
import graft.sources.Tables

/** IVF ANN recall + bucketed co-located joins. */
class IvfBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF top-k is deterministic and achieves useful recall") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.filter($"vec_id" >= 10)
    val qs = e.filter($"vec_id" < 10)
    val centroids = IvfIndex.trainCentroids(cands, "vec_id", "embedding", 16, 2)
    assert(centroids.size == 16 && centroids.forall(_.size == 64))

    val ivf = IvfIndex.ivfTopK(cands, qs, "vec_id", "embedding", 5, centroids, 4)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val exact = VectorOps.bruteForceTopK(cands, qs, "vec_id", "embedding", 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // Random vectors are IVF's adversarial case (no cluster structure);
    // nprobe=4 of 16 buckets must still beat the 25% floor of random
    // bucketing because near neighbors correlate with the quantizer.
    assert(recall >= 0.25, s"recall=$recall")

    // determinism: retraining gives identical centroids
    val again = IvfIndex.trainCentroids(cands, "vec_id", "embedding", 16, 2)
    assert(again == centroids)

    // full-probe parity (the q_knn_ivf oracle argument): with
    // nprobe = k every pair is scored exactly once, so IVF equals
    // brute force row-for-row, not just set-wise
    val full = IvfIndex.ivfTopK(cands, qs, "vec_id", "embedding", 5, centroids, 16)
      .select($"qid", $"cid", $"rn").as[(Long, Long, Long)].collect().toSet
    val exactRows = VectorOps.bruteForceTopK(cands, qs, "vec_id", "embedding", 5)
      .select($"qid", $"cid", $"rn").as[(Long, Long, Long)].collect().toSet
    assert(full == exactRows)
  }

  test("bucketed tables join without a shuffle") {
    // tables land in TestSpark's per-JVM temp warehouse, so stale dirs
    // cannot survive across runs; only the in-JVM catalog needs clearing
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    Tables.orders(spark, TestSpark.sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, TestSpark.sf)
      .selectExpr("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lines")

    val joined = spark.table("b_lines")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: no shuffle exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.orders(spark, TestSpark.sf), $"l_orderkey" === $"o_orderkey").count())
  }
}
