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

  /** Consistent-hash RING placement + movement audit (SURVEY.md §2
    * row 278) — the OTHER classic minimal-movement scheme next to
    * row-202 rendezvous (Karger et al. 1997; memcached/Dynamo-style
    * rings): each shard owns `vnodesPer` pseudo-random ring positions
    * (poly_hash64("ring|shard|v")), a key (poly_hash64("key|k"))
    * belongs to the first vnode clockwise — the smallest position ≥
    * the key's, wrapping to the globally smallest. Where rendezvous
    * pays N hashes per key at lookup, the ring pays ONE hash + a
    * search of a static table — the trade placement systems actually
    * choose between; vnodes smooth the ring's load variance.
    *
    * Scale shape: the vnode tables are DATA-INDEPENDENT constants
    * (shards·vnodesPer longs), computed driver-side and shipped as
    * plan literals — no broadcast, no join; per key the owner is a
    * bounded filter-count over the sorted literal array (the
    * registeredDomain suffix-probe posture). Keys dedupe first; the
    * movement matrix is one map-side-combined groupBy. Growing S→S+1
    * may move a key ONLY to the new shard's vnode arcs — surviving
    * shards never trade keys (spec-pinned). */
  def ringVnodes(shards: Int, vnodesPer: Int): Seq[(Long, Long)] =
    (0 until shards).flatMap { sh =>
      (0 until vnodesPer).map { v =>
        (PolyHash64.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"ring|$sh|$v")),
          sh.toLong)
      }
    }.sortBy(_._1)

  private def ringOwner(kpos: Column, vnodes: Seq[(Long, Long)]): Column = {
    val posArr = typedLit(vnodes.map(_._1))
    val shardArr = typedLit(vnodes.map(_._2))
    // index of the first position >= kpos in the sorted table ==
    // count of positions below; past the end wraps to slot 0
    val idx = size(filter(posArr, p => p < kpos))
    val widx = when(idx === vnodes.size, lit(0)).otherwise(idx)
    element_at(shardArr, widx + 1)
  }

  /** Movement matrix for growing `shards` → `shards + 1` under ring
    * placement of the distinct values of `keyCol`. */
  def ringMovement(df: DataFrame, keyCol: Column, shards: Int,
                   vnodesPer: Int = 64): DataFrame = {
    require(shards >= 1 && vnodesPer >= 1, s"bad ring: $shards x $vnodesPer")
    val keys = df.select(keyCol.cast(StringType).as("k"))
      .filter(col("k").isNotNull).distinct()
      .withColumn("kpos", PolyHash64.poly_hash64(concat(lit("key|"), col("k"))))
    keys
      .withColumn("shard_old", ringOwner(col("kpos"), ringVnodes(shards, vnodesPer)))
      .withColumn("shard_new", ringOwner(col("kpos"), ringVnodes(shards + 1, vnodesPer)))
      .groupBy(col("shard_old"), col("shard_new"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** §2 row 278 — ring movement of the event user_id population,
    * 8 shards × 64 vnodes growing to 9. */
  def hashRingQ(s: SparkSession, d: String): DataFrame =
    ringMovement(Tables.events(s, d), col("user_id"), shards = 8)
      .orderBy(col("shard_old"), col("shard_new"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rendezvous" -> (rendezvousQ _),
    "q_hash_ring" -> (hashRingQ _))

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
    },

    // vnode tables re-derived in HUGEINT via the shared poly replay
    // over 'ring|s|v'; per key the clockwise owner = min vnode pos >=
    // kpos, wrapping to the global min — replayed as a conditional-min
    // aggregate + a position lookback join
    "q_hash_ring" -> {
      def vn(name: String, shards: Int) =
        name + " AS (" + TrainingOps.polyHashOverSql("s, v",
          s"""SELECT CAST(r.i AS BIGINT) AS s, CAST(q.i AS BIGINT) AS v,
             |  'ring|' || CAST(r.i AS VARCHAR) || '|' || CAST(q.i AS VARCHAR) AS t
             |FROM range(0, $shards) r(i) CROSS JOIN range(0, 64) q(i)""".stripMargin) + ")"
      val kp = TrainingOps.polyHashOverSql("k",
        """SELECT k, 'key|' || k AS t
          |FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k
          |      FROM events WHERE user_id IS NOT NULL) keys""".stripMargin)
      def own(name: String, vnRel: String) =
        s"""agg_$name AS (
           |  SELECT p.k, MIN(CASE WHEN v.h >= p.h THEN v.h END) AS mh, MIN(v.h) AS gm
           |  FROM kp p CROSS JOIN $vnRel v GROUP BY p.k, p.h),
           |own_$name AS (
           |  SELECT a.k, v.s AS shard FROM agg_$name a
           |  JOIN $vnRel v ON v.h = COALESCE(a.mh, a.gm))""".stripMargin
      s"""WITH ${vn("vn8", 8)},
         |${vn("vn9", 9)},
         |kp AS ($kp),
         |${own("old", "vn8")},
         |${own("new", "vn9")}
         |SELECT o.shard AS shard_old, n.shard AS shard_new,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys
         |FROM own_old o JOIN own_new n ON o.k = n.k
         |GROUP BY o.shard, n.shard
         |ORDER BY shard_old, shard_new""".stripMargin
    })
}
