package graft.operators

import org.apache.spark.sql.DataFrame

/** Combine N per-source daily frames into one wide daily table.
  *
  * Reference behavior (transform.py:130-153): every data type produces a
  * per-day frame; they are iteratively full-outer-merged on `day` into
  * `combined_daily`. Spark's using-column full join coalesces the key,
  * matching pandas `merge(on='day', how='outer')`.
  *
  * Scale note: each join shuffles on `day`. Spark reuses the hash
  * partitioning on the join key across the fold, so the chain costs one
  * exchange per input, not per pair — and with day-partitioned storage
  * the exchanges disappear entirely. Day cardinality is low; AQE
  * coalesces the small post-join partitions.
  */
object CombineDaily {

  def combine(frames: Seq[DataFrame], key: String = "day"): DataFrame = {
    require(frames.nonEmpty, "combine needs at least one frame")
    frames.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
  }
}
