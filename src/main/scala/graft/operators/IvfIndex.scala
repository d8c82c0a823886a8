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

  /** Squared L2 distance between a vector column and a centroid literal. */
  private def distSq(vec: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(vec, array(centroid.map(lit): _*),
        (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
      lit(0d), (acc, x) => acc + x)

  /** Nearest-centroid id: array_min over (dist, idx) structs — struct
    * ordering gives the deterministic argmin. */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSq(vec, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** `nprobe` nearest centroid ids, closest first. */
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    slice(transform(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSq(vec, c).as("d"), lit(i).as("i"))
    }: _*)), s => s.getField("i")), 1, nprobe)

  /** Deterministic k-means: hash-selected seeds, `iters` Lloyd steps.
    * Each step: one assignment scan + one per-dimension mean agg; the
    * k×dim model round-trips through the driver. */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): Seq[Seq[Double]] = {
    val seeds = df
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
      .toSeq
    require(seeds.size == k,
      s"training set has only ${seeds.size} rows — need at least k=$k for k-means seeds")

    (1 to iters).foldLeft(seeds) { (centroids, _) =>
      val assigned = df.select(col(idCol), col(vecCol).as("v"))
        .withColumn("b", nearestCentroid(col("v"), centroids))
      val means = assigned
        .select(col("b"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("b"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (b, rows) =>
          b -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // empty buckets keep their previous centroid
      centroids.indices.map(i => means.getOrElse(i, centroids(i)))
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
