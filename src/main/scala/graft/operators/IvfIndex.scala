package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** IVF-style approximate nearest neighbor (SURVEY.md §2.3#41 scale
  * path, §8): a deterministic k-means coarse quantizer buckets the
  * corpus; queries probe only the `nprobe` nearest buckets.
  *
  * At 100 TB: the index assign is one scan (centroids broadcast as
  * literals), the search touches |corpus|·nprobe/k rows instead of the
  * whole corpus, and everything is equi-join-shaped. Training cost is
  * `iters` scans with a k×dim driver-side model — the one deliberate
  * driver round-trip (model size is KBs, independent of data size).
  *
  * Fully deterministic: seeds are the k vectors with smallest
  * xxhash64(id) (reproducible across partitionings), ties in
  * assignment break on the lowest centroid id.
  */
object IvfIndex {

  /** Squared L2 distance between an array<double> column and a centroid
    * literal (codegen'd ArrayL2Sq kernel — the HOF zip_with formulation
    * ran interpreted, k times per row). Callers cast the vector to
    * array<double> ONCE, not per centroid. */
  private def distSq(vecD: Column, centroid: Seq[Double]): Column =
    graft.plans.VectorKernels.l2_sq(vecD, array(centroid.map(lit): _*))

  private def asDouble(vec: Column): Column = vec.cast(ArrayType(DoubleType))

  /** Nearest-centroid id: array_min over (dist, idx) structs — struct
    * ordering gives the deterministic argmin. */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val v = asDouble(vec)
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSq(v, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")
  }

  /** `nprobe` nearest centroid ids, closest first. */
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    val v = asDouble(vec)
    slice(transform(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSq(v, c).as("d"), lit(i).as("i"))
    }: _*)), s => s.getField("i")), 1, nprobe)
  }

  /** Deterministic k-means over a bounded hash-sample.
    *
    * The quantizer model is k×dim doubles (KBs) — training it needs a
    * REPRESENTATIVE sample, not the corpus: one distributed top-N by
    * xxhash64(id) pulls `trainSample` rows to the driver (bounded,
    * scale-independent — this is the one deliberate driver round-trip,
    * the same shape faiss/ScaNN use), then Lloyd steps run in-memory.
    * The previous formulation re-scanned the FULL corpus per iteration
    * (2 distributed jobs each) and dominated q_knn_ivf's bench time.
    *
    * Deterministic: seeds are the k smallest-hash rows (identical to
    * the old seed rule), assignment ties break on lowest centroid id,
    * empty clusters keep their previous centroid. */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int, trainSample: Int = 4096): Seq[Seq[Double]] =
    trainFromSample(hashSample(df, idCol, vecCol, math.max(k, trainSample)), k, iters)

  /** The bounded driver sample in replayable id-hash order — ONE
    * distributed sort-limit job; callers training several models off
    * the same corpus (e.g. [[PqIndex.kmeansCodebook]]'s per-subspace
    * codebooks) collect it once and slice driver-side instead of
    * re-running the corpus pass per model. */
  def hashSample(df: DataFrame, idCol: String, vecCol: String,
                 n: Int): Array[Array[Double]] = df
    .withColumn("__h", xxhash64(col(idCol)))
    .orderBy(col("__h"), col(idCol))
    .limit(n)
    .select(col(vecCol))
    .collect()
    .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Lloyd iterations over an in-memory sample (deterministic: first-k
    * seeds, strict-< lowest-id tie-break, empty clusters keep their
    * centroid). */
  def trainFromSample(sample: Array[Array[Double]], k: Int, iters: Int): Seq[Seq[Double]] = {
    require(sample.length >= k,
      s"training set has only ${sample.length} rows — need at least k=$k for k-means seeds")

    val dim = sample.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val seeds = sample.take(k).map(_.clone()).toSeq

    (1 to iters).foldLeft(seeds.map(_.toSeq)) { (centroids, _) =>
      val cs = centroids.map(_.toArray).toArray
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = dist2(v, cs(0)); var j = 1
        while (j < k) {
          val dj = dist2(v, cs(j))
          if (dj < bestD) { bestD = dj; best = j } // strict < = lowest-id tie-break
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids.indices.map { j =>
        if (counts(j) == 0) centroids(j) // empty cluster keeps its centroid
        else sums(j).map(_ / counts(j)).toSeq
      }
    }
  }

  /** Approximate top-k: probe the `nprobe` nearest buckets per query,
    * exact cosine within the candidates. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              centroids: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfTopK needs a non-empty centroid list")
    VectorOps.requireDim(candidates, vecCol, centroids.head.size)
    val c = candidates
      .select(col(idCol).as("cid"), quantize(col(vecCol)).as("c_qv"),
        nearestCentroid(col(vecCol), centroids).as("bucket"))
      .withColumn("c_nsq", dotQuantized(col("c_qv"), col("c_qv")).cast(DoubleType))
    val q = queries
      .select(col(idCol).as("qid"), quantize(col(vecCol)).as("q_qv"),
        explode(nearestCentroids(col(vecCol), centroids, nprobe)).as("bucket"))
      .withColumn("q_nsq", dotQuantized(col("q_qv"), col("q_qv")).cast(DoubleType))
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("cos", cosineFrom(
        dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType),
        col("q_nsq"), col("c_nsq")))
    VectorOps.topKByCosine(scored, k)
  }
}
