package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Numeric band join (SURVEY.md §2 row 290) — ALL pairs with
  * |l.value − r.value| ≤ eps: the proximity join under an absolute
  * tolerance, distinct from row 57 (interval containment) and row 72
  * (as-of = NEAREST match only). The reconciliation primitive: match
  * observed amounts to reference amounts, sensor readings to
  * calibration points, near-equal floats across two exports.
  *
  * A naive theta join is a cartesian product; Spark's optimizer will
  * not save it (a non-equi condition alone plans BroadcastNestedLoop).
  * Bucket blocking makes it an EQUI join: bucket width = eps, the
  * probe side explodes into its bucket ± 1 (any in-band partner lies
  * within one bucket of the probe — |a−b| ≤ eps spans at most two
  * eps-wide cells), the build side keys by its own bucket, then the
  * exact |diff| ≤ eps filter runs post-join. Each build row sits in
  * exactly ONE bucket and the probe's three buckets are distinct, so
  * no pair duplicates and no dedup pass is needed.
  *
  * Scale shape: one shuffle on the bucket key each side (3× the probe
  * rows — eps-bounded, not corpus-squared); per-bucket occupancy
  * bounds the fan-out, so skew = a value stampede at one amount — the
  * salting cure from SkewJoin applies on the bucket key if a single
  * amount dominates. */
object BandJoin {

  /** Pairs (l, r, diff = l − r) with |diff| ≤ eps. Keys must be
    * integer-valued (fixed-point upstream — the repo's cents rule). */
  def bandJoin(left: DataFrame, right: DataFrame,
               lKey: Column, rKey: Column, eps: Long): DataFrame = {
    require(eps >= 1, s"eps must be >= 1, got $eps")
    val lb = GraphOps.fdiv(lKey.cast(LongType), lit(eps))
    val rb = GraphOps.fdiv(rKey.cast(LongType), lit(eps))
    val probe = left.withColumn("__lv", lKey.cast(LongType))
      .withColumn("__b", explode(array(lb - 1L, lb, lb + 1L)))
    val build = right.withColumn("__rv", rKey.cast(LongType))
      .withColumn("__b", rb)
    probe.join(build, Seq("__b"))
      .filter(abs(col("__lv") - col("__rv")) <= eps)
      .withColumn("diff", col("__lv") - col("__rv"))
      .drop("__b", "__lv", "__rv")
  }

  /** §2 row 290 — price reconciliation: lineitem extended prices (in
    * exact DECIMAL cents) matched to part retail prices within ±10
    * cents, aggregated per part (the raw pair frame is the operator;
    * the per-part rollup keeps the registered result bounded). */
  def bandJoinQ(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select((col("l_extendedprice") * 100).cast(LongType).as("l_cents"))
    val pt = Tables.part(s, d)
      .select(col("p_partkey"), (col("p_retailprice") * 100).cast(LongType).as("p_cents"))
    bandJoin(li, pt, col("l_cents"), col("p_cents"), eps = 10L)
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("diff")).as("min_diff"), max(col("diff")).as("max_diff"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_band_join" -> (bandJoinQ _))

  val oracles: Map[String, String] = Map(
    // the oracle states the SEMANTICS directly (a BETWEEN range join —
    // DuckDB's IEJoin makes it feasible at oracle scale); the engine's
    // bucket blocking must reproduce it exactly
    "q_band_join" ->
      """WITH l AS (
        |  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS l_cents FROM lineitem),
        |p AS (
        |  SELECT p_partkey, CAST(p_retailprice * 100 AS BIGINT) AS p_cents FROM part)
        |SELECT p.p_partkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  CAST(MIN(l.l_cents - p.p_cents) AS BIGINT) AS min_diff,
        |  CAST(MAX(l.l_cents - p.p_cents) AS BIGINT) AS max_diff
        |FROM l JOIN p
        |  ON l.l_cents BETWEEN p.p_cents - 10 AND p.p_cents + 10
        |GROUP BY p.p_partkey
        |ORDER BY p.p_partkey""".stripMargin)
}
