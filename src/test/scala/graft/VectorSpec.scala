package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.VectorOps
import graft.sources.Tables

/** Similarity search: exactness of the baseline, recall of the LSH path. */
class VectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine matches a driver-side computation") {
    val rows = Tables.embeddings(spark, TestSpark.sf)
      .filter($"vec_id" < 2).orderBy($"vec_id")
      .select($"embedding").as[Array[Float]].collect()
    def q(x: Double) = math.floor(x * 1e6)
    val qa = rows(0).map(x => q(x.toDouble))
    val qb = rows(1).map(x => q(x.toDouble))
    val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
    val expected = dot / (math.sqrt(qa.map(x => x * x).sum) * math.sqrt(qb.map(x => x * x).sum))

    val e = Tables.embeddings(spark, TestSpark.sf)
    val a = e.filter($"vec_id" === 0).select($"embedding".as("ea"))
    val b = e.filter($"vec_id" === 1).select($"embedding".as("eb"))
    val got = a.crossJoin(b)
      .select(VectorFunctions.cosine($"ea", $"eb").as("cos")).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute-force top-k is ordered and complete") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val res = VectorOps.bruteForceTopK(
      e.filter($"vec_id" >= 10), e.filter($"vec_id" < 10), "vec_id", "embedding", 5)
    val byQ = res.groupBy($"qid").agg(count(lit(1)).as("n"), max($"rn").as("maxrn"))
      .as[(Long, Long, Long)].collect()
    assert(byQ.length == 10 && byQ.forall { case (_, n, m) => n == 5 && m == 5 })
  }

  test("LSH top-k achieves useful recall vs brute force") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.filter($"vec_id" >= 10)
    val qs = e.filter($"vec_id" < 10)
    val exact = VectorOps.bruteForceTopK(cands, qs, "vec_id", "embedding", 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val approx = VectorOps.lshTopK(cands, qs, "vec_id", "embedding", 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // Random-hyperplane LSH over *random* vectors is the adversarial
    // case; 8 tables x 4 planes should still clear a conservative floor.
    assert(approx.nonEmpty && recall >= 0.3, s"recall=$recall")
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val pairs = VectorOps.nearDupPairs(Tables.embeddings(spark, TestSpark.sf),
      "vec_id", "embedding", "label", 0.3)
    assert(pairs.filter($"id_a" >= $"id_b").count() == 0)
    assert(pairs.filter($"cos" < 0.3).count() == 0)
  }

  test("hard negatives never share the anchor's label, never self-match") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val got = VectorOps.mineHardNegatives(e, e.filter($"vec_id" < 5),
        "vec_id", "embedding", "label", k = 3)
      .select($"qid", $"q_lbl", $"cid", $"c_lbl", $"rn")
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (qid, ql, cid, cl, _) => ql != cl && qid != cid })
    // per anchor: exactly k rows, ranks 1..k
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._5).sorted.toSeq == (1L to 3L))
    }
  }

  test("hard negatives = brute-force ranking restricted to other labels") {
    // hand-checkable frame: anchor label 0 at origin-ish; negatives at
    // decreasing cosine
    val df = Seq(
      (0L, 0, Array(1f, 0f)),
      (1L, 1, Array(0.9f, 0.1f)),   // most similar wrong-label
      (2L, 1, Array(0.5f, 0.5f)),
      (3L, 0, Array(0.99f, 0.01f)), // same label: excluded despite similarity
      (4L, 2, Array(0f, 1f)))       // near-orthogonal
      .toDF("vec_id", "label", "embedding")
    val got = VectorOps.mineHardNegatives(df, df.filter($"vec_id" === 0L),
        "vec_id", "embedding", "label", k = 3)
      .select($"cid", $"rn").as[(Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (4L, 3L)))
  }

  test("hard-negative plan broadcasts the anchor batch, corpus never shuffles") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val plan = VectorOps.mineHardNegatives(e, e.filter($"vec_id" < 5),
        "vec_id", "embedding", "label", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // the corpus side reaches the join without a hash exchange; the
    // only hashpartitioning belongs to the per-anchor ranking window
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("requireDim fails with a clear message on an empty dataset") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorOps.requireDim(empty, "embedding", 64)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("requireMagnitude admits unit-scale vectors, rejects overflow-scale") {
    val ok = Seq((1L, Array(0.5f, -0.9f)), (2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    VectorOps.requireMagnitude(ok, "embedding", 2) // must not throw
    // maxSafeAbs(2) ≈ 2.1e3; 1e5 is far past the wrap point
    val bad = Seq((1L, Array(1e5f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorOps.requireMagnitude(bad, "embedding", 2)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("trainCentroids fails fast when the corpus is smaller than k") {
    val tiny = Seq((1L, Array(0.1f, 0.2f)), (2L, Array(0.3f, 0.4f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.trainCentroids(tiny, "vec_id", "embedding", k = 8, iters = 1)
    }
    assert(e.getMessage.contains("k=8"))
  }
}
