package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.VectorKernels.dot_long
import graft.sources.Tables

/** Scalar (int8) embedding quantization (SURVEY.md §2 row 110) — the
  * 4× compression rung of the vector-storage ladder ([[PqIndex]] is
  * the 32× rung): each float becomes `floor(x·127 / maxAbs)` on a
  * single symmetric grid, so dot products and L2 distances stay exact
  * INTEGER math over the codes and search in the compressed domain
  * ranks near-identically to full precision (grid error ≤ maxAbs/127
  * per element). This is the FAISS SQ8 recipe with a global symmetric
  * scale; the affine per-dimension variant trades replayability for
  * marginally tighter cells, the wrong trade here.
  *
  * Scale shape (100 TB): `maxAbs` is ONE bounded scalar aggregate
  * (the watermark-read posture — a broadcastable model, not state on
  * the driver hot path); encoding is a per-row projection (no
  * shuffle); search is the same broadcast-query + k-bounded
  * [[graft.functions.MinKByLong]] top-k as [[PqIndex.adcTopK]] — at
  * 4 bytes/dim → 1 byte/dim the exhaustive scan's I/O drops 4× with
  * no index build at all, which is the right first lever before IVF
  * machinery.
  *
  * Determinism/oracle: the only float ops are `x·127` and the divide
  * by `maxAbs` — both single IEEE-754 doubles ops on identical
  * inputs, bit-deterministic in Spark and DuckDB; `floor` then lands
  * in exact integers (the [[graft.functions.VectorFunctions]]
  * argument). Expression SHAPE is pinned: `(x·127)/maxAbs`, never
  * `x·(127/maxAbs)` — the two round differently. */
object ScalarQuant {

  /** The corpus' max |element| — the grid scale. One map-side-combined
    * aggregate; cast to double (exact float widening) both engines. */
  def maxAbs(df: DataFrame, vecCol: String): Double = {
    val m = df.agg(max(array_max(transform(col(vecCol),
        x => abs(x.cast(DoubleType)))))).head().getDouble(0)
    require(m > 0d, "sq8: corpus max |element| must be positive")
    m
  }

  /** (id, q8: array<long> codes in [-128, 127], nsq8: long) — the
    * compressed table a deployment persists. floor keeps every code in
    * range without a clamp: |x·127/maxAbs| ≤ 127 + one ulp. */
  def encode(df: DataFrame, idCol: String, vecCol: String, scale: Double): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"),
        transform(col(vecCol),
          x => floor((x.cast(DoubleType) * lit(127d)) / lit(scale)).cast(LongType))
          .as("q8"))
      .withColumn("nsq8", dot_long(col("q8"), col("q8")))

  /** Exact integer L2 top-k in the compressed domain: queries encoded
    * on the SAME grid, distance = nsq_a + nsq_b − 2·dot8 (long), k
    * bounded per query through partial aggregation. */
  def sq8TopK(codes: DataFrame, queryCodes: DataFrame, k: Int): DataFrame = {
    val q = queryCodes.select(col("id").as("qid"), col("q8").as("q_q8"),
      col("nsq8").as("q_nsq8"))
    val summed = codes.crossJoin(broadcast(q))
      .select(col("qid"), col("id").as("cid"),
        (col("q_nsq8") + col("nsq8")
          - lit(2L) * dot_long(col("q_q8"), col("q8"))).as("adc_d2"))
    PqIndex.topKByD2(summed, k)
      .withColumnRenamed("adc_d2", "d2")
  }

  /** §2 row 110 — SQ8 top-5 for every 50th vector over `embeddings`. */
  def sq8TopKQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val scale = maxAbs(e, "embedding")
    val codes = encode(e, "vec_id", "embedding", scale)
    sq8TopK(codes, codes.filter(col("id") % 50 === 0), k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sq8_topk" -> (sq8TopKQ _),
  )

  /** BIGINT dot over pre-encoded integer lists. */
  private def idot(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]))"

  val oracles: Map[String, String] = Map(
    // the scale scalar, the same (x*127)/scale floor grid, then exact
    // integer L2 rank — expression shape matches the Spark side op for
    // op so the IEEE doubles agree bit-for-bit
    "q_sq8_topk" ->
      s"""WITH mx AS (
         |  SELECT MAX(m) AS scale FROM (
         |    SELECT list_max(list_transform(embedding,
         |      x -> abs(CAST(x AS DOUBLE)))) AS m FROM embeddings)),
         |enc AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |    list_transform(embedding,
         |      x -> CAST(floor((CAST(x AS DOUBLE) * 127) / mx.scale) AS BIGINT)) AS q8
         |  FROM embeddings, mx),
         |encn AS MATERIALIZED (
         |  SELECT id, q8, ${idot("q8", "q8")} AS nsq8 FROM enc),
         |sc AS (
         |  SELECT q.id AS qid, c.id AS cid,
         |    CAST(q.nsq8 + c.nsq8 - 2 * ${idot("q.q8", "c.q8")} AS BIGINT) AS d2
         |  FROM encn c CROSS JOIN (SELECT * FROM encn WHERE id % 50 = 0) q)
         |SELECT qid, cid, d2, rn FROM (
         |  SELECT qid, cid, d2,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
         |  FROM sc) t
         |WHERE rn <= 5
         |ORDER BY qid, rn""".stripMargin,
  )
}
