package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation: salted join (SURVEY.md §4).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so heavily that even split
  * partitions bottleneck, or when AQE is unavailable (streaming,
  * non-shuffle operators downstream). The large side spreads each hot
  * key over `salt` sub-keys; the small side is replicated `salt` times.
  * Shuffle cost: |large| + salt·|small| — the standard trade.
  */
object SkewJoin {

  /** Inner equi-join of `large` ⋈ `small` on `key`, salted. Result is
    * row-identical to the plain join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    // Deterministic-per-row salt is unnecessary — any spread works; use
    // a hash of the row id so reruns are stable in local mode too.
    val l = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val r = small.withColumn("__salt", explode(
      array((0 until salt).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
