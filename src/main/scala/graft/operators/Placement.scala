package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.PolyHash64
import graft.sources.Tables

/** Rendezvous (highest-random-weight) shard placement + movement audit
  * (SURVEY.md §2 row 202) — the re-sharding cost question every
  * 100 TB keyed store hits: `pmod(hash(key), N)` placement moves
  * ~(N−1)/N of ALL keys when N changes (a full-cluster rebalance);
  * rendezvous hashing (Thaler & Ravishankar 1996 — the scheme behind
  * consistent routing in Riak/Ceph-CRUSH-style placement) assigns
  * each key to argmax_node hash(key, node), so adding a node moves
  * EXACTLY the keys the new node wins (≈ 1/(N+1) of them) and NO key
  * moves between surviving nodes — the audit proves that property on
  * the actual key population instead of trusting the math. Output is
  * the movement matrix (shard_old, shard_new, n_keys): off-diagonal
  * rows can only have shard_new = the added node; their total is the
  * measured movement fraction.
  *
  * Scale shape (100 TB): keys dedupe first (placement is a function
  * of the key, not its row count); each key fans out to the FIXED
  * node list (N+1 rows — map-side, no shuffle); both argmaxes (old =
  * nodes < N, new = all) come from ONE conditional max(struct)
  * aggregate per key; the movement matrix is a second map-side-
  * combined groupBy on an N²-bounded key space. Hash ties break to
  * the larger node id (struct order) — deterministic, and with a
  * 64-bit hash effectively unreachable. */
object Placement {

  /** Movement matrix for growing `nodes` → `nodes + 1` under
    * rendezvous placement of the distinct values of `keyCol`. */
  def rendezvousMovement(df: DataFrame, keyCol: Column, nodes: Int): DataFrame = {
    require(nodes >= 1, s"need at least one node, got $nodes")
    val keys = df.select(keyCol.cast(StringType).as("k"))
      .filter(col("k").isNotNull).distinct()
    val nodeIds = (0 to nodes).map(n => lit(n.toLong))
    val fanned = keys.withColumn("node", explode(array(nodeIds: _*)))
      .withColumn("h", PolyHash64.poly_hash64(
        concat(lit("hrw|"), col("node").cast(StringType), lit("|"), col("k"))))
    fanned.groupBy(col("k"))
      .agg(
        max(when(col("node") < nodes, struct(col("h"), col("node")))).as("o"),
        max(struct(col("h"), col("node"))).as("n"))
      .groupBy(col("o.node").as("shard_old"), col("n.node").as("shard_new"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** §2 row 202 — movement of the distinct event user_id population
    * when a 8-node layout grows to 9. */
  def rendezvousQ(s: SparkSession, d: String): DataFrame =
    rendezvousMovement(Tables.events(s, d), col("user_id"), nodes = 8)
      .orderBy(col("shard_old"), col("shard_new"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rendezvous" -> (rendezvousQ _))

  val oracles: Map[String, String] = Map(
    // distinct keys × range(9) fan-out, the shared poly_hash64 HUGEINT
    // replay over 'hrw|node|key', per-key (h DESC, node DESC) argmax
    // restricted/unrestricted, then the movement-matrix groupBy
    "q_rendezvous" -> {
      val hs = TrainingOps.polyHashOverSql("k, node",
        """SELECT k, node, 'hrw|' || CAST(node AS VARCHAR) || '|' || k AS t
          |FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k
          |      FROM events WHERE user_id IS NOT NULL) keys
          |CROSS JOIN (SELECT CAST(i AS BIGINT) AS node FROM range(0, 9) r(i)) n"""
          .stripMargin)
      s"""WITH hs AS ($hs),
         |pk AS (
         |  SELECT k,
         |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY h DESC, node DESC) AS rn_new,
         |    CASE WHEN node < 8 THEN
         |      ROW_NUMBER() OVER (PARTITION BY k, (node < 8) ORDER BY h DESC, node DESC)
         |    END AS rn_old,
         |    node
         |  FROM hs),
         |old AS (SELECT k, node AS shard_old FROM pk WHERE rn_old = 1),
         |new AS (SELECT k, node AS shard_new FROM pk WHERE rn_new = 1)
         |SELECT o.shard_old, n.shard_new, CAST(COUNT(*) AS BIGINT) AS n_keys
         |FROM old o JOIN new n ON o.k = n.k
         |GROUP BY o.shard_old, n.shard_new
         |ORDER BY shard_old, shard_new""".stripMargin
    })
}
