package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Embedding similarity operators (SURVEY.md §2.3 #39-41).
  *
  * Brute-force top-k broadcasts the (small) query set against the
  * candidate corpus — a map-side-only scored scan plus one window for
  * the per-query top-k; this is the exact baseline. The scale path is
  * random-hyperplane LSH: bucket ids are per-row expressions, the
  * bucket join is an equi-join, so candidate count tracks bucket
  * collisions instead of |Q|×|C|.
  */
object VectorOps {

  /** Add an exact squared-norm column (compute once, before any join). */
  def withNormSq(df: DataFrame, vecCol: String, out: String = "nsq"): DataFrame =
    df.withColumn(out, normSqDec(col(vecCol)).cast(DoubleType))

  /** Quantized vector + squared norm, computed once per row. Joins then
    * pay only long multiply-adds per pair. */
  private def prepared(df: DataFrame, idCol: String, vecCol: String,
                       idOut: String, qvOut: String, nsqOut: String): DataFrame =
    df.select(col(idCol).as(idOut), quantize(col(vecCol)).as(qvOut))
      .withColumn(nsqOut, dotQuantized(col(qvOut), col(qvOut)).cast(DoubleType))

  /** Shared ranking tail: per-query top-k by cosine desc, cid
    * tiebreak. One place so the exact/LSH/IVF paths cannot drift. */
  def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
  }

  /** Hard-negative mining (SURVEY.md §2 row 156) — the contrastive-
    * training data op: for each anchor, the k most-similar corpus
    * vectors with a DIFFERENT label. Those are exactly the pairs a
    * triplet/contrastive loss learns most from — easy negatives (far,
    * different label) contribute ~zero gradient, and random sampling
    * finds almost only easy ones; mining the near-but-wrong ones is
    * what the embedding-training pipelines this library feeds do at
    * scale.
    *
    * Shape mirrors [[bruteForceTopK]]: the ANCHOR BATCH broadcasts
    * (caller batches anchors — the corpus scans once per batch, never
    * self-joins), labels ride the prepared frames, the different-label
    * filter applies BEFORE ranking (an anchor's own row drops there
    * too), and ranking uses the same (cos DESC, cid) order contract as
    * [[topKByCosine]]. At corpus×corpus scale, feed `candidates` from
    * the IVF cells (row 107) or LSH buckets (row 41) instead of the
    * full table — mining tolerates approximate candidates by
    * construction (a missed near-negative costs a training pair, not
    * correctness).
    */
  def mineHardNegatives(candidates: DataFrame, anchors: DataFrame,
                        idCol: String, vecCol: String, labelCol: String,
                        k: Int): DataFrame = {
    val c = candidates.select(col(idCol).as("cid"), col(labelCol).as("c_lbl"),
        quantize(col(vecCol)).as("c_qv"))
      .withColumn("c_nsq", dotQuantized(col("c_qv"), col("c_qv")).cast(DoubleType))
    val q = anchors.select(col(idCol).as("qid"), col(labelCol).as("q_lbl"),
        quantize(col(vecCol)).as("q_qv"))
      .withColumn("q_nsq", dotQuantized(col("q_qv"), col("q_qv")).cast(DoubleType))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_lbl") =!= col("q_lbl"))
      .withColumn("cos", cosineFrom(
        dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType),
        col("q_nsq"), col("c_nsq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col("q_lbl"), col("cid"), col("c_lbl"),
        col("cos"), col("rn"))
  }

  /** Fails fast when the declared dim does not match the data: a
    * mismatch would null the hyperplane dots and collapse every row
    * into one bucket (full cross product) — silently. */
  def requireDim(df: DataFrame, vecCol: String, dim: Int): Unit = {
    val first = df.select(size(col(vecCol))).limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"vector dataset is empty — cannot validate dim of column '$vecCol'"))
    require(first.getInt(0) == dim,
      s"vector dim ${first.getInt(0)} != declared dim $dim")
  }

  /** Full-scan guard for untrusted vector magnitudes: quantized dots
    * overflow Long silently past `VectorFunctions.maxSafeAbs(dim)` (see
    * the bound derivation there). One agg over the dataset — call once
    * per corpus before indexing, not per query. */
  def requireMagnitude(df: DataFrame, vecCol: String, dim: Int): Unit = {
    val bound = graft.functions.VectorFunctions.maxSafeAbs(dim)
    val worst = df.agg(
      max(array_max(transform(col(vecCol), x => abs(x.cast(DoubleType))))))
      .collect().headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
      .getOrElse(0d)
    require(worst <= bound,
      f"vector magnitude $worst%.3g exceeds quantized-dot overflow bound $bound%.3g for dim $dim")
  }

  /** §2.3#40 — exact cosine top-k of each query vector against the
    * candidates. `queries` must be broadcast-small. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = prepared(candidates, idCol, vecCol, "cid", "c_qv", "c_nsq")
    val q = prepared(queries, idCol, vecCol, "qid", "q_qv", "q_nsq")
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", cosineFrom(
        dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType), col("q_nsq"), col("c_nsq")))
    topKByCosine(scored, k)
  }

  /** §2.3#39 — near-duplicate pairs by cosine within equi-join blocks
    * (blocking column keeps the pair space linear-ish at scale). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        quantize(col(vecCol)).as("qv"))
      .withColumn("nsq", dotQuantized(col("qv"), col("qv")).cast(DoubleType))
    val a = v.select(col("blk"), col("id").as("id_a"), col("qv").as("qv_a"), col("nsq").as("nsq_a"))
    val b = v.select(col("blk").as("blk_b"), col("id").as("id_b"), col("qv").as("qv_b"), col("nsq").as("nsq_b"))
    a.join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b"))
      .withColumn("cos", cosineFrom(
        dotQuantized(col("qv_a"), col("qv_b")).cast(DoubleType), col("nsq_a"), col("nsq_b")))
      .filter(col("cos") >= threshold)
      .select(col("blk").as("block"), col("id_a"), col("id_b"), col("cos"))
  }

  // ---- LSH (random hyperplanes) ----------------------------------------

  /** Deterministic pseudo-random hyperplanes (splitmix64-derived,
    * reproducible across runs — required for resumable pipelines). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d4ecda9226d4e9L
      z ^ (z >>> 31)
    }
    (0 until numPlanes).map(p => (0 until dim).map { i =>
      val h = mix(seed + p.toLong * 131071L + i)
      (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
    })
  }

  /** Sign-bit bucket id of a vector under the hyperplanes (per-row
    * expression, no shuffle). Plane dots run through the codegen'd
    * ArrayDotDouble kernel — one cast of the vector to array<double>
    * shared across all planes. */
  def lshBucket(vecCol: Column, planes: Seq[Seq[Double]]): Column = {
    val v = vecCol.cast(ArrayType(DoubleType))
    planes.zipWithIndex.map { case (p, j) =>
      val dot = graft.plans.VectorKernels.dot_double(v, array(p.map(lit): _*))
      when(dot >= 0, lit(1L << j)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** Multi-table LSH buckets: `tables` independent hash tables of
    * `planesPerTable` hyperplanes each. One row per (vector, table) —
    * union-by-explode keeps the join equi-shaped. Multi-table is the
    * standard recall lever: a true neighbor only needs to collide in
    * ONE table. */
  def lshBuckets(vecCol: Column, tables: Int, planesPerTable: Int, dim: Int): Column =
    array((0 until tables).map { t =>
      val planes = hyperplanes(planesPerTable, dim, seed = 42L + t * 7919L)
      struct(lit(t).as("tbl"), lshBucket(vecCol, planes).as("h"))
    }: _*)

  /** §2.3#41 — approximate top-k: candidates colliding with the query in
    * any of the LSH tables, ranked by exact cosine, deduped per pair. */
  def lshTopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              tables: Int = 8, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    requireDim(candidates, vecCol, dim)
    val c = prepared(candidates, idCol, vecCol, "cid", "c_qv", "c_nsq")
      .withColumn("bucket", explode(lshBuckets(col("c_qv"), tables, planesPerTable, dim)))
    val q = prepared(queries, idCol, vecCol, "qid", "q_qv", "q_nsq")
      .withColumn("bucket", explode(lshBuckets(col("q_qv"), tables, planesPerTable, dim)))
    val cands = c.join(broadcast(q), "bucket")
      .select(col("qid"), col("cid"), col("q_qv"), col("c_qv"), col("q_nsq"), col("c_nsq"))
      .dropDuplicates("qid", "cid")
    val scored = cands.withColumn("cos", cosineFrom(
      dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType), col("q_nsq"), col("c_nsq")))
    topKByCosine(scored, k)
  }
}
