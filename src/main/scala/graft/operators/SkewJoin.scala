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

  /** The per-row salt expression — shared with the balance spec so
    * the pin measures exactly what the operator ships. */
  def saltExpr(salt: Int) =
    pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong))

  /** Hot keys of `df.key`: every key carrying at least `minRows`
    * rows. ONE map-side-combined aggregation; the collect is bounded
    * by construction — at most |df|/minRows keys can clear the bar,
    * so a sane threshold (say 10× the target partition size) returns
    * a handful of celebrities, never a data-sized frame. */
  def hotKeys(df: DataFrame, key: String, minRows: Long): Seq[Any] =
    df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minRows && col(key).isNotNull)
      .select(col(key)).collect().map(_.get(0)).toSeq

  /** Refined salted join: ONLY the hot keys are salted `salt` ways
    * (their build rows replicated `salt`×); the cold remainder joins
    * plain and pays nothing. Replication cost drops from salt·|small|
    * to salt·|small ∩ hot| — for one celebrity key, salt rows total.
    * Result is row-identical to the plain inner join (NULL keys match
    * nothing in either form). Salt spread is hash-of-row-id: uniform
    * in expectation regardless of row order, no coordination. */
  def saltedHotJoin(large: DataFrame, small: DataFrame, key: String,
                    hot: Seq[Any], salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    if (hot.isEmpty) return large.join(small, Seq(key))
    val isHot = col(key).isin(hot: _*)
    val lHot = large.filter(isHot).withColumn("__salt", saltExpr(salt))
    val sHot = small.filter(isHot).withColumn("__salt", explode(
      array((0 until salt).map(i => lit(i.toLong)): _*)))
    val hotJoined = lHot.join(sHot, Seq(key, "__salt")).drop("__salt")
    val coldJoined = large.filter(!isHot).join(small.filter(!isHot), Seq(key))
    hotJoined.unionByName(coldJoined)
  }

  /** Detect-then-salt convenience: celebrities found by [[hotKeys]]
    * at `minRows`, salted `salt` ways; a skew-free input degrades to
    * exactly the plain join. */
  def salted(large: DataFrame, small: DataFrame, key: String,
             minRows: Long, salt: Int): DataFrame =
    saltedHotJoin(large, small, key, hotKeys(large, key, minRows), salt)
}
