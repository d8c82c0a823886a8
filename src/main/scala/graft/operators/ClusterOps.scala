package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Distributed Lloyd k-means over the FULL corpus (SURVEY.md §2 row
  * 113) — the whole-data complement of [[IvfIndex.trainCentroids]]
  * (which fits its quantizer on a bounded driver sample). Use this
  * when the model must reflect every row, not a sample: balanced
  * semantic shards, SemDeDup cluster blocks sized to the real mass
  * distribution, per-cluster budget accounting.
  *
  * Scale shape (100 TB): the model is k centroids — a driver-side
  * list of k·dim longs (KBs, corpus-size-independent: the bounded
  * driver model posture [[IvfIndex]] established). Each Lloyd
  * iteration is ONE distributed pass: nearest-centroid assignment is
  * a pure projection against centroid LITERALS (k codegen'd integer
  * dot kernels per row — no join, no shuffle), and the centroid
  * update collapses `posexplode` element rows through one
  * map-side-combined aggregation into k·dim rows. The final
  * assignment pass is projection-only — a plan with ZERO exchanges
  * (pinned in ClusterSpec).
  *
  * Determinism/oracle parity: seeds are [[SemDedup.hashSeeds]]
  * (smallest replayable poly-hash — the oracle's seed CTE is
  * `SemDedup.assignSql` VERBATIM, so the two engines' quantizers
  * cannot drift); vectors are quantized once (floor(x·1e6) longs) so
  * every distance is exact integer math with ties to the lowest
  * centroid id; the new centroid element is `floorDiv(sum, count)` —
  * Java floor semantics, replayed in DuckDB as
  * `(s - ((s % n + n) % n)) // n` (both exact: the numerator is
  * divisible by n). Empty clusters drop out of the model in both
  * engines (no update row → no centroid), so k may shrink.
  *
  * OVERFLOW BOUND (same family as [[graft.functions.VectorFunctions]]):
  * a per-cluster element sum is exact while
  * n_cluster · maxAbs · 1e6 < 2^63 — unit-scale embeddings leave
  * headroom to ~9e12 rows per cluster; gate untrusted magnitudes
  * through `VectorOps.requireMagnitude` first.
  */
object ClusterOps {

  /** Integer centroid model: id + quantized elements (+ derived
    * squared norm). The id is the seed row's id and survives updates,
    * so cluster labels are stable across iterations. */
  final case class IntCentroid(cid: Long, cq: Seq[Long]) {
    lazy val cnsq: Long = cq.map(x => x * x).sum
  }

  /** (d2, cid) of the nearest centroid as a struct column — argmin via
    * `array_min` over per-centroid structs (struct ordering compares d2
    * first, then cid: the deterministic lowest-id tie-break). A pure
    * projection: the centroids are literals, so no join and no shuffle
    * reach the plan. */
  def nearestIntCentroid(qv: Column, nsq: Column, cents: Seq[IntCentroid]): Column = {
    require(cents.nonEmpty, "k-means needs a non-empty centroid model")
    array_min(array(cents.map { c =>
      struct(
        (nsq + lit(c.cnsq) - lit(2L) * dotQuantized(qv, array(c.cq.map(lit): _*))).as("d"),
        lit(c.cid).as("i"))
    }: _*))
  }

  /** Train the quantized centroid model with `iters` full-corpus Lloyd
    * iterations from the k hash-seeded donors. Each iteration runs one
    * distributed job whose shuffle carries only (cluster, pos) partial
    * sums — k·dim rows after map-side combine, independent of corpus
    * size. */
  def lloydCentroids(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): Seq[IntCentroid] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val seeds = SemDedup.hashSeeds(df, idCol, vecCol, k).collect()
      .map(r => IntCentroid(r.getLong(0), r.getSeq[Long](1).toIndexedSeq)).toSeq
    if (iters == 0) return seeds

    val v = df
      .select(col(idCol).cast(LongType).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("nsq", dotQuantized(col("qv"), col("qv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      (1 to iters).foldLeft(seeds) { (cents, _) =>
        val partials = v
          .select(nearestIntCentroid(col("qv"), col("nsq"), cents)
            .getField("i").as("cluster"),
            posexplode(col("qv")).as(Seq("pos", "el")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(col("el")).as("s"), count(lit(1)).as("n"))
          .collect() // k·dim rows — the bounded driver model
        partials
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (cid, rows) =>
            // Math.floorDiv == the oracle's (s - pmod(s, n)) // n
            IntCentroid(cid,
              rows.sortBy(_._2).map(t => Math.floorDiv(t._3, t._4)).toIndexedSeq)
          }
      }
    } finally { v.unpersist(); () }
  }

  /** Assign every row to its nearest centroid: (idCol, cluster, d2) —
    * d2 is the exact quantized squared L2. Projection-only (no
    * exchange), so at 100 TB this is a single scan at full codegen
    * throughput. */
  def assignKMeans(df: DataFrame, idCol: String, vecCol: String,
                   cents: Seq[IntCentroid]): DataFrame =
    df.select(col(idCol).cast(LongType).as(idCol), quantize(col(vecCol)).as("__qv"))
      .withColumn("__nsq", dotQuantized(col("__qv"), col("__qv")))
      .withColumn("__m", nearestIntCentroid(col("__qv"), col("__nsq"), cents))
      .select(col(idCol), col("__m.i").as("cluster"), col("__m.d").as("d2"))

  /** §2 row 113 — k=8, two full-corpus Lloyd iterations over
    * `embeddings`, final exact assignment. */
  def kmeansQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cents = lloydCentroids(e, "vec_id", "embedding", k = 8, iters = 2)
    assignKMeans(e, "vec_id", "embedding", cents).orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmeans" -> (kmeansQ _),
  )

  /** BIGINT dot over pre-quantized integer lists (the ScalarQuant
    * oracle helper shape). */
  private def idot(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]))"

  /** One unrolled Lloyd update: element sums over the previous
    * assignment (`from`: vec_id, cluster, qv), floor-div by the count,
    * lists rebuilt in element order. Emits `$c` (cid, cq, cnsq). */
  private def updateSql(c: String, from: String) =
    s"""$c AS MATERIALIZED (
       |  SELECT cid, cq, ${idot("cq", "cq")} AS cnsq FROM (
       |    SELECT cluster AS cid, list(fd ORDER BY i) AS cq FROM (
       |      SELECT cluster, i, (s - (((s % n) + n) % n)) // n AS fd FROM (
       |        SELECT cluster, i, SUM(qv[CAST(i + 1 AS INT)]) AS s, COUNT(*) AS n
       |        FROM $from, range(0, 64) r(i)
       |        GROUP BY cluster, i) _sums) _fd
       |    GROUP BY cluster) _cq)""".stripMargin

  /** One unrolled assignment against centroid CTE `$c`: every vector
    * to its integer-L2-nearest centroid, ties to the lowest cid. */
  private def assignToSql(a: String, c: String) =
    s"""$a AS MATERIALIZED (
       |  SELECT vec_id, cid AS cluster, qv, nsq, d2 FROM (
       |    SELECT e.vec_id, c.cid, e.qv, e.nsq,
       |      e.nsq + c.cnsq - 2 * ${idot("e.qv", "c.cq")} AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY e.nsq + c.cnsq - 2 * ${idot("e.qv", "c.cq")}, c.cid) AS rn
       |    FROM enc e CROSS JOIN $c c) t
       |  WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // seed choice + iteration-0 assignment are SemDedup.assignSql
    // VERBATIM (the shared-coarse-quantizer rule IVF-PQ follows); two
    // unrolled update/assign rounds then replay the operator's exact
    // integer arithmetic, floor-div included.
    "q_kmeans" ->
      s"""WITH
         |${SemDedup.assignSql("")},
         |enc AS MATERIALIZED (
         |  SELECT vec_id, cluster, nsq,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         |  FROM asg),
         |${updateSql("c1", "enc")},
         |${assignToSql("a1", "c1")},
         |${updateSql("c2", "a1")},
         |${assignToSql("a2", "c2")}
         |SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS d2 FROM a2
         |ORDER BY vec_id""".stripMargin,
  )
}
