package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering for multi-column pruning (SURVEY.md §9).
  *
  * Sorting a table by (a, b) gives perfect pruning on `a` and none on
  * `b`; interleaving the bits of both rank spaces gives useful min/max
  * file statistics on BOTH columns. Ranks are uniform-width buckets
  * over each column's [min, max] (fully distributed — no global sort);
  * under heavy value skew uniform buckets degrade on the skewed column
  * (quantile boundaries would be the skew-robust upgrade, SURVEY §9).
  * The z-value is a pure bit expression, and the write path is
  * repartitionByRange(z) + sortWithinPartitions(z) — each output file
  * covers a small hyper-rectangle of the (a, b) space, so parquet
  * row-group stats prune scans filtered on either column.
  */
object ZOrder {

  val Bits = 8 // 256 buckets per column → 65k z-cells, ample per-file stats

  /** Interleave the low `Bits` bits of two rank columns. */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      (shiftright(a, i).bitwiseAND(1) * lit(1L << (2 * i + 1))) +
      (shiftright(b, i).bitwiseAND(1) * lit(1L << (2 * i)))
    }.reduce(_ + _)

  /** Add a z-value over uniform bucket ranks of the two columns.
    * width_bucket against broadcast min/max scalars — no global window
    * sort (a `ntile` formulation would single-partition the whole
    * table), fully distributed; one tiny agg for the bounds. */
  def withZValue(df: DataFrame, colA: String, colB: String,
                 out: String = "__z"): DataFrame = {
    val n = 1 << Bits
    val bounds = df.agg(
      min(col(colA)).cast(DoubleType).as("__mina"),
      max(col(colA)).cast(DoubleType).as("__maxa"),
      min(col(colB)).cast(DoubleType).as("__minb"),
      max(col(colB)).cast(DoubleType).as("__maxb"))
    // Nulls rank to bucket 0 explicitly: width_bucket(null) is null and
    // least() SKIPS nulls (least(n-1, null) = n-1), so without an inner
    // coalesce a null value would silently land in the MAX bucket and
    // wreck min/max pruning for the top of the range. Bucket 0 =
    // "nulls first", matching Spark's default null ordering. The
    // coalesce must wrap the width_bucket term BEFORE least sees it.
    def rank(c: String, lo: Column, hi: Column): Column =
      least(lit(n.toLong - 1),
        coalesce(
          width_bucket(col(c).cast(DoubleType), lo, hi + 1d, lit(n)) - 1,
          lit(0L)))
    df.crossJoin(broadcast(bounds))
      .withColumn(out, interleave(
        rank(colA, col("__mina"), col("__maxa")),
        rank(colB, col("__minb"), col("__maxb"))))
      .drop("__mina", "__maxa", "__minb", "__maxb")
  }

  /** Cluster and write: range-partition then sort by the z-value. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int): Unit =
    withZValue(df, colA, colB)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Skew-robust variant (SURVEY §9 upgrade): ranks come from
    * approx-quantile boundaries instead of uniform value widths.
    *
    * Under heavy value skew, uniform buckets collapse — nearly every
    * row lands in bucket 0 and the z-order degenerates to a single-
    * column sort. Quantile boundaries equalize ROW COUNT per bucket by
    * construction. The boundary model is <= (2^Bits - 1) doubles per
    * column collected once on the driver (bounded, scale-independent —
    * same posture as the IVF centroid model); the rank itself is a
    * codegen'd comparison chain over boundary literals, null → bucket 0
    * like the uniform variant. */
  def withZValueQuantile(df: DataFrame, colA: String, colB: String,
                         out: String = "__z"): DataFrame = {
    val n = 1 << Bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val Array(rawA, rawB) =
      df.stat.approxQuantile(Array(colA, colB), probs, 0.001)
    def rank(c: String, raw: Array[Double]): Column = {
      val bounds = raw.distinct.sorted // skew repeats boundaries; dedupe
      coalesce(
        bounds.map(b => when(col(c).cast(DoubleType) > b, 1L).otherwise(0L))
          .reduce(_ + _),
        lit(0L))
    }
    // Materialize ranks before interleave: the bit-interleave references
    // its rank input 8 times, and inlining a 255-term comparison chain
    // 8x would explode the codegen'd project (CollapseProject keeps
    // multiply-referenced non-trivial aliases in their own stage).
    df.withColumn("__ra", rank(colA, rawA))
      .withColumn("__rb", rank(colB, rawB))
      .withColumn(out, interleave(col("__ra"), col("__rb")))
      .drop("__ra", "__rb")
  }

  /** Cluster and write with quantile ranks. */
  def writeZOrderedQuantile(df: DataFrame, colA: String, colB: String,
                            path: String, numFiles: Int): Unit =
    withZValueQuantile(df, colA, colB)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
