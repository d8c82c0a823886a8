package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Bucketed cumulative-prefix decomposition — the shared engine behind
  * every "running sum over a data-scaled frame" shape (first built for
  * ROC-AUC, SURVEY.md §2 row 194; generalized here for ABC classes,
  * RFM quantile scores, and any future cumulative).
  *
  * A plain `Window.orderBy(k)` with no partition funnels the ENTIRE
  * frame through one task — fine on 60k rows, a single-executor sort
  * of billions at 100 TB. The decomposition: split the order key's
  * range into ≤`buckets` order-compatible cells (approx-quantile cuts
  * — a bounded driver model of ≤63 doubles), compute per-cell sums,
  * take an EXCLUSIVE prefix over the ≤64-row cell frame (the only
  * unpartitioned window — bounded, not data-scaled), and run the
  * within-cell cumulative partitioned by the cell. Long sums
  * reassociate exactly, so the result is bit-identical to the
  * single-window form; the double cast of the order key is monotone
  * though possibly non-injective — ties collapse INTO one cell, never
  * across the order, so cell order == key order and prefixes
  * decompose exactly.
  */
object Prefix {

  /** Adds `out` = cumulative sum of `valueCol` over rows ordered by
    * (`orderCol` asc/desc, tieCols asc...), ROWS UNBOUNDED PRECEDING
    * to CURRENT ROW — without any unpartitioned window over the data
    * frame. `orderCol` must be numeric (castable to double for the
    * range cuts); `valueCol` must be integral (exact reassociation).
    * Input is persisted (two passes: cuts + main); callers on a
    * one-shot frame need no unpersist — the query ends with it.
    *
    * NOTE on ties: rows tied on `orderCol` but distinguished by
    * `tieCols` land in the SAME cell (the cell is a pure function of
    * `orderCol`), so the within-cell window sees the full tie run and
    * the tiebreak order is honored exactly. */
  def cumSumBucketed(df: DataFrame, orderCol: String, descending: Boolean,
                     tieCols: Seq[String], valueCol: String, out: String,
                     buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2 && buckets <= 64, s"buckets must be in [2,64], got $buckets")
    val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = persisted.select(col(orderCol).cast(DoubleType).as("__pd"))
      .stat.approxQuantile("__pd", probs, 0.01)
      .filter(d => !d.isNaN).distinct.sorted
    val v = col(orderCol).cast(DoubleType)
    // cell index ascends WITH the requested order: asc → count of cuts
    // strictly below the value; desc → count strictly above. NULL keys
    // get their own EDGE cell matching the window's null placement
    // (Spark sorts nulls FIRST ascending, LAST descending) — without
    // it a null lands in cell 0 under desc, ahead of every real value,
    // and the "bit-identical to the single-window form" contract
    // breaks for any caller with null keys
    val nonNull = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + (if (descending) when(v < lit(c), 1).otherwise(0)
             else when(v > lit(c), 1).otherwise(0))
    }
    val b = when(v.isNull,
        if (descending) lit(cuts.length + 1) else lit(-1))
      .otherwise(nonNull)
    val withB = persisted.withColumn("__b", b)
    val bpre = withB.groupBy(col("__b")).agg(sum(col(valueCol)).as("__bs"))
      .withColumn("__pre", coalesce(sum(col("__bs")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__bs")
    val ordExprs: Seq[Column] =
      (if (descending) col(orderCol).desc else col(orderCol).asc) +:
        tieCols.map(col(_).asc)
    val wj = Window.partitionBy(col("__b")).orderBy(ordExprs: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    withB.join(broadcast(bpre), Seq("__b"))
      .withColumn(out, col("__pre") + sum(col(valueCol)).over(wj))
      .drop("__b", "__pre")
  }
}
