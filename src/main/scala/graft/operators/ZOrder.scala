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

  /** Hilbert-curve index of two `bits`-bit ranks (SURVEY.md §2 row
    * 288) — the locality-better sibling of [[interleave]]: EVERY
    * consecutive pair of Hilbert cells is Manhattan-adjacent (the
    * curve never jumps, unlike Morton's 2^k-sized seams), so files
    * cut from a Hilbert sort cover tighter rectangles and min/max
    * stats prune better on both columns — why Delta/Hudi offer
    * hilbert next to zorder. Standard xy2d (Hamilton's iterative
    * form): per level s = 2^i from the top, accumulate s²·((3·rx)⊕ry)
    * and rotate the quadrant frame.
    *
    * Pure integer Column fold — the per-level constants ride in as an
    * ARRAY LITERAL so the fold stays linear-size (an unrolled
    * when-tree would duplicate the x/y subtrees 2^bits times), and no
    * variable-amount shift is needed. Codegen'd, zero shuffles. */
  def hilbertIndex(xRank: Column, yRank: Column, bits: Int = Bits): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val ss = array(((bits - 1) to 0 by -1).map(i => lit(1L << i)): _*)
    aggregate(ss,
      struct(xRank.cast(LongType).as("x"), yRank.cast(LongType).as("y"),
        lit(0L).as("d")),
      (acc, s) => {
        val x = acc.getField("x"); val y = acc.getField("y")
        val rx = when(x.bitwiseAND(s) > 0, 1L).otherwise(lit(0L))
        val ry = when(y.bitwiseAND(s) > 0, 1L).otherwise(lit(0L))
        struct(
          when(ry === 0, when(rx === 1, s - 1L - y).otherwise(y)).otherwise(x).as("x"),
          when(ry === 0, when(rx === 1, s - 1L - x).otherwise(x)).otherwise(y).as("y"),
          (acc.getField("d") + s * s * (rx * 3L).bitwiseXOR(ry)).as("d"))
      },
      acc => acc.getField("d"))
  }

  /** Cluster and write along the Hilbert curve (uniform bucket ranks,
    * the [[withZValue]] null/bounds discipline). */
  def writeHilbert(df: DataFrame, colA: String, colB: String,
                   path: String, numFiles: Int): Unit =
    withRanks(df, colA, colB)
      .withColumn("__h", hilbertIndex(col("__ra"), col("__rb")))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__ra", "__rb", "__h")
      .write.mode("overwrite").parquet(path)

  /** The uniform bucket ranks of [[withZValue]], exposed as columns. */
  def withRanks(df: DataFrame, colA: String, colB: String): DataFrame = {
    val n = 1 << Bits
    val bounds = df.agg(
      min(col(colA)).cast(DoubleType).as("__mina"),
      max(col(colA)).cast(DoubleType).as("__maxa"),
      min(col(colB)).cast(DoubleType).as("__minb"),
      max(col(colB)).cast(DoubleType).as("__maxb"))
    def rank(c: String, lo: Column, hi: Column): Column =
      least(lit(n.toLong - 1),
        coalesce(
          width_bucket(col(c).cast(DoubleType), lo, hi + 1d, lit(n)) - 1,
          lit(0L)))
    df.crossJoin(broadcast(bounds))
      .withColumn("__ra", rank(colA, col("__mina"), col("__maxa")))
      .withColumn("__rb", rank(colB, col("__minb"), col("__maxb")))
      .drop("__mina", "__maxa", "__minb", "__maxb")
  }

  /** §2 row 288 — the Hilbert index over deterministic mod-256 ranks
    * of (doc_id, n_chars): rank derivation stays integer so the
    * oracle (a 8-level recursive CTE running the identical rotation
    * arithmetic) replays bit-for-bit. */
  def hilbertQ(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = graft.sources.Tables.documents(s, d)
    docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(256L)).as("x_rank"),
        pmod(col("n_chars"), lit(256L)).as("y_rank"))
      .withColumn("h", hilbertIndex(col("x_rank"), col("y_rank"), bits = 8))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_hilbert" -> (hilbertQ _))

  val oracles: Map[String, String] = Map(
    // the identical xy2d rotation per level, i = 7..0, via a recursive
    // CTE; xor() is DuckDB's bitwise xor, `&`/`<<` match the engine's
    // bitwiseAND/constant shifts
    "q_hilbert" ->
      """WITH RECURSIVE pts AS (
        |  SELECT doc_id, CAST(doc_id % 256 AS BIGINT) AS x0,
        |    CAST(n_chars % 256 AS BIGINT) AS y0
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, x0 AS x, y0 AS y, CAST(0 AS BIGINT) AS d, 7 AS i FROM pts
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN s - 1 - y ELSE y END
        |         ELSE x END,
        |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN s - 1 - x ELSE x END
        |         ELSE y END,
        |    d + s * s * xor(rx * 3, ry),
        |    i - 1
        |  FROM (
        |    SELECT doc_id, x, y, d, i,
        |      (CAST(1 AS BIGINT) << i) AS s,
        |      CASE WHEN (x & (CAST(1 AS BIGINT) << i)) > 0
        |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rx,
        |      CASE WHEN (y & (CAST(1 AS BIGINT) << i)) > 0
        |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ry
        |    FROM h WHERE i >= 0) t)
        |SELECT p.doc_id, p.x0 AS x_rank, p.y0 AS y_rank, f.d AS h
        |FROM pts p JOIN (SELECT doc_id, d FROM h WHERE i = -1) f
        |  ON p.doc_id = f.doc_id
        |ORDER BY p.doc_id""".stripMargin)
}
