package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Near-dup pipelines vs the exact-Jaccard ground truth (§2.3 #36-38). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact ground truth: all pairs with 3-gram Jaccard >= 0.5 (the
    * planted near-dups sit at ~0.99; everything else is < 0.2). */
  lazy val truePairs: Set[(Long, Long)] =
    TextOps.ngramJaccardQ(spark, TestSpark.sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

  test("ground truth contains planted near-dups") {
    assert(truePairs.nonEmpty)
  }

  test("MinHash-LSH finds every true near-dup pair (no false negatives at j≈0.99)") {
    val found = Dedup.minhashNearDups(Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truePairs.subsetOf(found),
      s"missed: ${truePairs.diff(found)}")
  }

  test("MinHash-LSH verified pairs all exceed the threshold (no false positives)") {
    val bad = Dedup.minhashNearDups(Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .filter($"jaccard" < 0.5).count()
    assert(bad == 0)
  }

  test("exact dedup groups cover the corpus") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val groups = Dedup.exactGroups(docs, $"text", $"doc_id")
    assert(groups.agg(sum($"n_copies")).as[Long].head == docs.count())
  }

  test("SimHash flags the planted near-dups as candidates") {
    val found = Dedup.simhashNearDups(Tables.documents(spark, TestSpark.sf),
        "doc_id", "text", maxHamming = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // SimHash is token-multiset-based; expect it to recover most of the
    // ~0.99-Jaccard pairs (it is allowed to add candidates of its own).
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.8, s"simhash recall $recall, found=${found.size}")
  }
}
