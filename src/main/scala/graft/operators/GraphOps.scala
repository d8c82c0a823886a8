package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Weighted PageRank over an arbitrary edge DataFrame (SURVEY.md §2
  * row 114) — the link-graph quality signal web-scale curation runs
  * before anything else (CommonCrawl-derived pipelines rank hosts by
  * centrality to pick crawl/keep candidates; the reference's DAG has
  * no graph step, this is part of the mandated LLM-pipeline surface).
  *
  * Scale shape (100 TB of edges): the rank state is O(nodes) and
  * stays DISTRIBUTED (never collected); each iteration is one
  * contribution join keyed on the source node + one groupBy on the
  * destination + one left join back to the node set — all equi-joins
  * on node ids, AQE-skew-safe, no driver state beyond two scalars
  * (node count, per-iteration dangling mass — the watermark-scalar
  * posture). The out-weight join is hoisted OUT of the loop (edges
  * carry their source's total weight from one pre-pass). Each
  * iteration's rank frame is localCheckpoint-materialized so plan
  * depth stays O(1) per iteration instead of O(iters) at the end.
  *
  * Determinism/oracle parity: pure integer arithmetic end to end.
  * Ranks live at `scale` (default 1e12); every division is
  * floor-div via `(a - pmod(a, b)) div b` (exact: the numerator is
  * made divisible first), damping is the rational dampNum/dampDen —
  * no float ever enters, so DuckDB replays iterations verbatim.
  * Dangling mass (nodes with no out-edges) is redistributed
  * uniformly each iteration, the standard treatment.
  *
  * OVERFLOW CONTRACT: rank·weight must stay under 2^63 — with the
  * default scale 1e12 that allows per-edge weights to ~9.2e6.
  * Callers with heavier edges pre-scale the weight column (ranking
  * depends only on the w/W ratios, so uniform scaling is harmless).
  */
object GraphOps {

  /** Exact integer floor-div of two long columns (b > 0): subtract the
    * positive remainder, then integral-divide (exact by construction —
    * same value both engines replay as `(a - pmod) // b`). */
  private[operators] def fdiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** (node, rank) after `iters` damped iterations; Σrank ≈ scale
    * (short only by per-division floor truncation).
    *
    * `init` warm-starts from persisted ranks (GraphState posture):
    * current nodes missing from `init` start at the uniform rank,
    * nodes in `init` but gone from the graph are dropped. The update
    * is a pure function of (ranks, edges, n), so running k1 iterations,
    * persisting, and resuming for k2 equals k1+k2 straight — integer-
    * exact (GraphSpec pins it). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
               iters: Int, scale: Long = 1000000000000L,
               dampNum: Long = 85L, dampDen: Long = 100L,
               init: Option[DataFrame] = None,
               smallGraphMax: Long = PeelSmallGraphMax): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < dampNum < dampDen")
    val w = col(wCol).cast(LongType)
    // The canonical edge frame is itself persisted: nodes reads it
    // TWICE (src ∪ dst) and outw/ew once each, so unpersisted the
    // caller's whole edge-derivation lineage (for the registered
    // queries, a lineitem⋈orders join) executes 4x before the first
    // iteration even starts — O(|E|) cache, one derivation pass.
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"),
      when(w > 0, w).otherwise(raise_error(
        lit("pageRank: edge weights must be positive"))).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Small-graph fast path (the connectedComponents discipline, bound
    // CHECKED on the materialized count): the registered queries run
    // this kernel over AGGREGATED graphs (nation→nation: ≤ 625 edges)
    // whose derivation is the real distributed work — iterating over
    // them then costs ~5 driver-scheduled jobs per round (contribution
    // shuffle + dangling broadcast + checkpoint; measured 49 jobs at
    // sf0.1). Under the bound, collect the validated edge frame once
    // (the raise_error weight guard fires on collect exactly as it
    // would distributed) and replay the SAME floor-div integer
    // iteration in the driver — Math.floorDiv(a, b) == fdiv(a, b) for
    // b > 0 by construction — so ranks are bit-identical; above the
    // bound the distributed loop below is unchanged. `init` is
    // O(prior nodes) — bounded whenever the graph is.
    if (e.count() <= smallGraphMax) {
      try {
        val rows = e.collect()
        val ow = new scala.collection.mutable.HashMap[Long, Long]()
        rows.foreach(r => ow(r.getLong(0)) = ow.getOrElse(r.getLong(0), 0L) + r.getLong(2))
        val nodeIds = (rows.map(_.getLong(0)) ++ rows.map(_.getLong(1))).distinct
        val n = nodeIds.length.toLong
        require(n > 0, "pageRank: empty edge set")
        val teleport = Math.floorDiv((dampDen - dampNum) * scale, dampDen * n)
        val uniform = Math.floorDiv(scale, n)
        var rank = new scala.collection.mutable.HashMap[Long, Long]()
        init match {
          case None => nodeIds.foreach(rank(_) = uniform)
          case Some(prev) =>
            val pr = prev.select(col("node").cast(LongType), col("rank").cast(LongType))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            nodeIds.foreach(nd => rank(nd) = pr.getOrElse(nd, uniform))
        }
        (1 to iters).foreach { _ =>
          val inc = new scala.collection.mutable.HashMap[Long, Long]()
          rows.foreach { r =>
            val (s, d, wv) = (r.getLong(0), r.getLong(1), r.getLong(2))
            inc(d) = inc.getOrElse(d, 0L) + Math.floorDiv(rank(s) * wv, ow(s))
          }
          val dm = nodeIds.iterator.filterNot(ow.contains).map(rank).sum
          val dmn = Math.floorDiv(dm, n)
          val next = new scala.collection.mutable.HashMap[Long, Long]()
          nodeIds.foreach { nd =>
            next(nd) = teleport + Math.floorDiv(
              dampNum * (inc.getOrElse(nd, 0L) + dmn), dampDen)
          }
          rank = next
        }
        val spark = edges.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.parallelize(
            nodeIds.toSeq.map(nd => org.apache.spark.sql.Row(nd, rank(nd))), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("rank", LongType, nullable = false))))
      } finally { e.unpersist(); () }
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // O(nodes) and consumed once per iteration by the dangling
    // anti-join — unpersisted it would replay the caller's whole
    // edge-derivation lineage every iteration
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // loop-invariant: each edge carries its source's total out-weight
    val ew = e.join(outw, "src").persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = nodes.count()
      require(n > 0, "pageRank: empty edge set")
      val teleport = Math.floorDiv((dampDen - dampNum) * scale, dampDen * n)
      val uniform = lit(Math.floorDiv(scale, n))
      val start = init match {
        case None => nodes.withColumn("rank", uniform)
        case Some(prev) => nodes
          .join(prev.select(col("node"), col("rank").as("__pr")), Seq("node"), "left")
          .select(col("node"), coalesce(col("__pr"), uniform).as("rank"))
      }
      val last = (1 to iters).foldLeft(start) { (ranks, _) =>
        val contrib = ew.join(ranks, ew("src") === ranks("node"))
          .select(col("dst"), fdiv(col("rank") * col("w"), col("ow")).as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
        val dangling = ranks.join(outw, ranks("node") === outw("src"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
        val next = nodes
          .join(contrib, nodes("node") === contrib("dst"), "left")
          .crossJoin(broadcast(dangling)) // 1-row aggregate
          .select(nodes("node"),
            (lit(teleport) + fdiv(lit(dampNum) *
              (coalesce(col("inc"), lit(0L)) + fdiv(col("dm"), lit(n))),
              lit(dampDen))).as("rank"))
          .localCheckpoint() // O(nodes); truncates per-iteration lineage
          // EAGERLY: the next iteration consumes ranks on TWO paths
          // (contribution join + the dangling broadcast aggregate,
          // which runs as its own collect job) — measured, the lazy
          // form re-pays rank lineage in the broadcast job (q_pagerank
          // 2.7 -> 4.4 s); label propagation below, with one consumer
          // per round, takes the lazy form
        next
      }
      last
    } finally { ew.unpersist(); outw.unpersist(); nodes.unpersist(); e.unpersist(); () }
  }

  /** The registered query's edge graph: nation-to-nation trade flows —
    * customer nation → supplier nation, weighted by lineitem count
    * COMPRESSED through `1 + (cnt-1) div 1024`: ranking rides the
    * w/W ratios, so uniform weight compression is loss-free up to
    * floor granularity, and it keeps the operator's rank·weight <
    * 2^63 contract honored at ANY scale factor (raw counts at TPC-H
    * SF 1e5 are ~1e9 per nation pair — rank·1e9 would wrap). Dims
    * broadcast; the fact join is the only big shuffle. */
  def nationFlowEdges(s: SparkSession, d: String): DataFrame =
    rawNationFlowEdges(s, d)
      .groupBy(col("src"), col("dst"))
      .agg((lit(1L) + fdiv(sum(col("w")) - 1L, lit(1024L))).as("w"))

  /** The same derivation BEFORE aggregation: one row per lineitem with
    * w=1, keyed by orderkey so callers can slice it into delta batches
    * (GraphState accumulates raw counts; Σ batches == the direct
    * count, exactly). */
  def rawNationFlowEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("c_nationkey").as("src"),
        col("s_nationkey").as("dst"), lit(1L).as("w"))
  }

  /** §2 row 114 — 3 damped iterations over the nation-flow graph. */
  def pageRankQ(s: SparkSession, d: String): DataFrame =
    pageRank(nationFlowEdges(s, d), "src", "dst", "w", iters = 3)
      .select(col("node"), col("rank")).orderBy(col("node"))

  /** Personalized PageRank (SURVEY.md §2 row 272) — the row-114 kernel
    * with teleport AND dangling mass returned to a SEED set instead of
    * uniformly: rank mass concentrates around the seeds, scoring every
    * node by its link-proximity to them. The seed-expansion /
    * focused-crawl primitive (given known-good domains, rank the rest
    * of the frontier) and the graph twin of row-156's hard-negative
    * mining. Same integer image (floor-div damping at `scale`),
    * same per-iteration shape as pageRank: one contribution shuffle,
    * a 1-row dangling broadcast, an O(nodes) seed-flag join (the seed
    * frame is node-bounded and usually tiny — broadcast). Seeds not
    * in the graph are dropped; mass conservation up to floor
    * truncation holds exactly as in pageRank. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           wCol: String, seeds: DataFrame, seedCol: String,
                           iters: Int, scale: Long = 1000000000000L,
                           dampNum: Long = 85L, dampDen: Long = 100L,
                           smallGraphMax: Long = PeelSmallGraphMax): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < dampNum < dampDen")
    val w = col(wCol).cast(LongType)
    // persisted for the same reason as pageRank's e: nodes/outw/ew
    // otherwise replay the caller's edge derivation 4x up front
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"),
      when(w > 0, w).otherwise(raise_error(
        lit("personalizedPageRank: edge weights must be positive"))).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Small-graph fast path — the pageRank replay with seed-directed
    // teleport/dangling return; see pageRank for the bound and
    // exactness argument. Seeds are node-bounded by the same check.
    if (e.count() <= smallGraphMax) {
      try {
        val rows = e.collect()
        val ow = new scala.collection.mutable.HashMap[Long, Long]()
        rows.foreach(r => ow(r.getLong(0)) = ow.getOrElse(r.getLong(0), 0L) + r.getLong(2))
        val nodeIds = (rows.map(_.getLong(0)) ++ rows.map(_.getLong(1))).distinct
        val nodeSet = nodeIds.toSet
        val seedSet = seeds.select(col(seedCol).cast(LongType).as("node")).distinct()
          .collect().map(_.getLong(0)).filter(nodeSet.contains).toSet
        val ns = seedSet.size.toLong
        require(ns > 0, "personalizedPageRank: no seed is a graph node")
        val teleport = Math.floorDiv((dampDen - dampNum) * scale, dampDen * ns)
        var rank = new scala.collection.mutable.HashMap[Long, Long]()
        nodeIds.foreach(nd =>
          rank(nd) = if (seedSet.contains(nd)) Math.floorDiv(scale, ns) else 0L)
        (1 to iters).foreach { _ =>
          val inc = new scala.collection.mutable.HashMap[Long, Long]()
          rows.foreach { r =>
            val (s, d, wv) = (r.getLong(0), r.getLong(1), r.getLong(2))
            inc(d) = inc.getOrElse(d, 0L) + Math.floorDiv(rank(s) * wv, ow(s))
          }
          val dm = nodeIds.iterator.filterNot(ow.contains).map(rank).sum
          val dmn = Math.floorDiv(dm, ns)
          val next = new scala.collection.mutable.HashMap[Long, Long]()
          nodeIds.foreach { nd =>
            val seeded = seedSet.contains(nd)
            next(nd) = (if (seeded) teleport else 0L) + Math.floorDiv(
              dampNum * (inc.getOrElse(nd, 0L) + (if (seeded) dmn else 0L)), dampDen)
          }
          rank = next
        }
        val spark = edges.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.parallelize(
            nodeIds.toSeq.map(nd => org.apache.spark.sql.Row(nd, rank(nd))), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("rank", LongType, nullable = false))))
      } finally { e.unpersist(); () }
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ew = e.join(outw, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val sd = seeds.select(col(seedCol).cast(LongType).as("node")).distinct()
      .join(nodes, Seq("node")) // seeds outside the graph carry no mass
      .select(col("node"), lit(true).as("__seed"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var flagged: DataFrame = null
    try {
      val ns = sd.count()
      require(ns > 0, "personalizedPageRank: no seed is a graph node")
      val teleport = Math.floorDiv((dampDen - dampNum) * scale, dampDen * ns)
      flagged = nodes.join(broadcast(sd), Seq("node"), "left")
        .select(col("node"), coalesce(col("__seed"), lit(false)).as("__seed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val start = flagged.select(col("node"), col("__seed"),
        when(col("__seed"), lit(Math.floorDiv(scale, ns))).otherwise(0L).as("rank"))
      val last = (1 to iters).foldLeft(start) { (ranks, _) =>
        val contrib = ew.join(ranks, ew("src") === ranks("node"))
          .select(col("dst"), fdiv(col("rank") * col("w"), col("ow")).as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
        val dangling = ranks.join(outw, ranks("node") === outw("src"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
        flagged
          .join(contrib, flagged("node") === contrib("dst"), "left")
          .crossJoin(broadcast(dangling)) // 1-row aggregate
          .select(flagged("node"), flagged("__seed"),
            (when(col("__seed"), lit(teleport)).otherwise(0L) +
              fdiv(lit(dampNum) * (coalesce(col("inc"), lit(0L)) +
                when(col("__seed"), fdiv(col("dm"), lit(ns))).otherwise(0L)),
                lit(dampDen))).as("rank"))
          .localCheckpoint() // two consumers next round (the pageRank posture)
      }
      last.select(col("node"), col("rank"))
    } finally {
      if (flagged != null) { flagged.unpersist(); () }
      sd.unpersist(); ew.unpersist(); outw.unpersist(); nodes.unpersist()
      e.unpersist(); ()
    }
  }

  /** §2 row 272 — 3 PPR iterations over the nation-flow graph, seeded
    * by the ASIA nations (the focused-crawl shape: rank every trading
    * partner by proximity to a trusted region). */
  def pprQ(s: SparkSession, d: String): DataFrame = {
    val seeds = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("seed"))
    personalizedPageRank(nationFlowEdges(s, d), "src", "dst", "w",
        seeds, "seed", iters = 3)
      .orderBy(col("node"))
  }

  /** Exact per-node triangle counts by degree-oriented wedge closure
    * (the compact-forward algorithm): canonicalize the undirected edge
    * set, orient every edge from its lower-(degree, id) endpoint to the
    * higher, generate wedges by self-joining oriented edges on their
    * source, and close each wedge against the oriented edge set. The
    * orientation bounds out-degrees by O(√m), so wedge volume is
    * O(m^1.5) — the skew-proof bound — instead of Σ deg² (a single
    * celebrity node would otherwise generate |corpus|² wedges). All
    * three steps are equi-joins: degrees (node-bounded) join in, the
    * wedge join keys on the shared source, closure keys on the
    * endpoint pair. No cartesian anywhere.
    *
    * The triangle SET is orientation-independent, so the oracle's
    * id-ordered 3-way join replays the same counts exactly. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      .join(deg.select(col("n").as("t"), col("d").as("dt")), "t")
    val w1 = oriented.select(col("s"), col("t").as("t1"), col("dt").as("dt1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"), col("dt").as("dt2"))
    val wedges = w1.join(w2, Seq("s"))
      .filter(col("dt1") < col("dt2") ||
        (col("dt1") === col("dt2") && col("t1") < col("t2")))
    val closed = wedges.join(
      oriented.select(col("s").as("t1"), col("t").as("t2")), Seq("t1", "t2"))
    closed.select(explode(array(col("s"), col("t1"), col("t2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** §2.11 — triangle cohesion of the embedding near-dup graph: nodes
    * in mutually-similar triads (the cluster-density diagnostic over
    * the same pair relation q_embed_neardup registers). */
  def trianglesQ(s: SparkSession, d: String): DataFrame =
    triangleCounts(VectorQueries.embedNearDupFrame(s, d), "id_a", "id_b")
      .orderBy(col("n_tri").desc, col("node"))

  /** Synchronous label propagation (SURVEY.md §2 row 141) — community
    * detection over an undirected pair graph, the coarser companion to
    * [[Dedup.connectedComponents]]: CC answers "transitively linked at
    * all?", LPA answers "which DENSE group?" (a chain of borderline
    * near-dup links no longer glues two clusters into one component).
    *
    * Determinism (the property plain LPA lacks): synchronous rounds —
    * every node updates from the PREVIOUS round's labels — and total
    * tie order (neighbor-count DESC, label ASC), so the result is a
    * pure function of (edges, iters) and DuckDB replays it verbatim.
    * Fixed `iters` rather than convergence detection: synchronous LPA
    * can 2-cycle on bipartite-ish regions, so a convergence loop is
    * not guaranteed to terminate; a small fixed round count is the
    * standard production choice and keeps the oracle an exact unroll.
    *
    * Scale shape: each round is ONE equi-join of edges to the O(nodes)
    * label frame + two hash aggregations keyed on the destination
    * (argmax via max(struct(cnt, -label)) — no per-node window, so a
    * celebrity node costs a wide aggregate, not a single-task sort);
    * label state is localCheckpoint-truncated per round, the pageRank
    * posture. Edge symmetrization doubles the edge frame once,
    * up front, persisted across rounds. */
  def labelPropagation(pairs: DataFrame, idACol: String, idBCol: String,
                       iters: Int = 4,
                       smallGraphMax: Long = PeelSmallGraphMax): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val p0 = pairs.select(col(idACol).cast(LongType).as("a"),
        col(idBCol).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
    // persist WITHOUT a finally-unpersist: everything here is lazy (the
    // rounds are lazy checkpoints), so no action runs before return — an
    // eager unpersist would drop the cache before the caller's first
    // job and every round would replay the caller's pair derivation
    // (the expensive part). This is a CALL-LIFETIME cache entry by
    // design (the minhashNearDups pattern): the CacheManager holds it
    // until the caller unpersists or clears the cache — Verify/Bench
    // clear between queries; a long-lived session that calls this
    // repeatedly should do the same after consuming the result.
    val edges = p0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(p0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // Small-graph fast path (the seedDistance/kCorePeel discipline,
    // bound CHECKED on the materialized count; this makes the operator
    // eager under the bound — the count doubles as the persist fill).
    // The driver replay runs the SAME synchronous rounds with the same
    // total tie order (count DESC, label ASC), so communities are
    // row-identical; above the bound the lazy distributed loop below
    // is unchanged.
    if (edges.count() <= smallGraphMax) {
      try {
        val rows = edges.collect()
        val nE = rows.length
        val srcA = new Array[Long](nE); val dstA = new Array[Long](nE)
        var i = 0
        while (i < nE) { srcA(i) = rows(i).getLong(0); dstA(i) = rows(i).getLong(1); i += 1 }
        val nodeIds = dstA.distinct
        var comm = new scala.collection.mutable.HashMap[Long, Long]()
        nodeIds.foreach(nd => comm(nd) = nd)
        (1 to iters).foreach { _ =>
          // (dst, neighbour community) -> count over the PREVIOUS round
          val cnt = new scala.collection.mutable.HashMap[(Long, Long), Long]()
          i = 0
          while (i < nE) {
            val key = (dstA(i), comm(srcA(i)))
            cnt(key) = cnt.getOrElse(key, 0L) + 1L
            i += 1
          }
          val next = new scala.collection.mutable.HashMap[Long, (Long, Long)]() // dst -> (c, label)
          cnt.foreach { case ((d, l), c) =>
            next.get(d) match {
              case Some((bc, bl)) if bc > c || (bc == c && bl <= l) => ()
              case _ => next(d) = (c, l)
            }
          }
          val nc = new scala.collection.mutable.HashMap[Long, Long]()
          next.foreach { case (d, (_, l)) => nc(d) = l }
          comm = nc
        }
        val spark = pairs.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.parallelize(
            nodeIds.toSeq.map(nd => org.apache.spark.sql.Row(nd, comm(nd))), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("community", LongType, nullable = false))))
      } finally { edges.unpersist(); () }
    }
    // every node of the pair graph appears as a dst after
    // symmetrization, so dst-keyed rounds cover all nodes
    val start = edges.select(col("dst").as("node")).distinct()
      .withColumn("community", col("node"))
    (1 to iters).foldLeft(start) { (lbl, _) =>
      edges.join(lbl, edges("src") === lbl("node"))
        .groupBy(col("dst"), col("community")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("community")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("community"))
        .localCheckpoint(eager = false) // O(nodes); truncates per-round
        // lineage LAZILY — no per-round job barrier (measured: the
        // eager form cost ~1s/round in pure scheduling on a small
        // graph)
    }
  }

  /** §2.12 — 4 synchronous rounds over the embedding near-dup graph
    * (the q_dedup_groups / q_triangles pair relation). */
  def labelPropQ(s: SparkSession, d: String): DataFrame =
    labelPropagation(VectorQueries.embedNearDupFrame(s, d), "id_a", "id_b", iters = 4)
      .orderBy(col("node"))

  /** Multi-source BFS hop distance (SURVEY.md §2 row 164) — exact
    * shortest hop count from a SEED SET along an undirected pair
    * graph, capped at `maxHops`: the "distance from trusted seeds"
    * quality signal (WebText-style curation ranks pages by link
    * distance from a vetted whitelist; here the registered query runs
    * it over the semantic near-dup graph — semantic hops from one
    * exemplar per label). Unreached nodes report dist = NULL — the
    * graph spine (every node of the symmetrized edge set, plus the
    * seeds) drives the output, the retrievalEval NULL-row posture:
    * isolation is the signal, not a dropped row.
    *
    * Scale shape: classic frontier expansion — per hop ONE equi-join
    * of the frontier against the edge frame, a distinct, and an
    * anti-join against the settled-distance state; all keyed on node
    * ids, AQE-skew-safe, no driver state beyond the hop counter. The
    * frontier is localCheckpoint-materialized per hop (it is read
    * three times: emptiness probe, union into state, next expansion)
    * and the loop exits early on an empty frontier, so the number of
    * rounds is min(maxHops, eccentricity of the seed set) — each
    * round O(frontier ⋈ edges), never corpus². Settled state is
    * O(nodes) and stays distributed.
    *
    * Exactness: layered BFS discovers each node at its true shortest
    * hop (the anti-join keeps first discovery; within a layer all
    * candidates carry the same dist), so `min(dist)` over DuckDB's
    * capped recursive walk replays it verbatim — pure integers. */
  def seedDistance(pairs: DataFrame, idACol: String, idBCol: String,
                   seeds: DataFrame, seedCol: String, maxHops: Int,
                   smallGraphMax: Long = PeelSmallGraphMax): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val p0 = pairs.select(col(idACol).cast(LongType).as("a"),
        col(idBCol).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = p0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(p0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Small-graph fast path (the connectedComponents discipline —
      // bound CHECKED on the materialized count, never assumed): the
      // distributed loop costs ~5 driver-scheduled jobs per hop
      // (broadcast builds + AQE shuffle stages + checkpoint + probe;
      // measured 62 jobs / ~4.5 s at sf0.1 on a graph a driver BFS
      // walks in microseconds). Under the bound, collect the edge list
      // and seed set once and replay the SAME layered BFS in the
      // driver — first discovery wins at its true hop, capped at
      // maxHops — so the output is row-identical; above the bound the
      // distributed frontier loop below is unchanged.
      val edgeCount = edges.count() // materializes the persist the loop needs anyway
      if (edgeCount <= smallGraphMax) {
        val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        edges.collect().foreach { r =>
          adj.getOrElseUpdate(r.getLong(0), scala.collection.mutable.ArrayBuffer.empty) += r.getLong(1)
        }
        val seedIds = seeds.select(col(seedCol).cast(LongType).as("node"))
          .distinct().collect().map(_.getLong(0))
        val dist = new scala.collection.mutable.HashMap[Long, Long]()
        seedIds.foreach(dist(_) = 0L)
        var frontier: Seq[Long] = seedIds.toSeq
        var h = 1L
        while (h <= maxHops && frontier.nonEmpty) {
          val nxt = scala.collection.mutable.ArrayBuffer[Long]()
          frontier.foreach { n =>
            adj.getOrElse(n, Nil).foreach { m =>
              if (!dist.contains(m)) { dist(m) = h; nxt += m }
            }
          }
          frontier = nxt.toSeq
          h += 1
        }
        // spine: every graph node (all appear as dst after
        // symmetrization) plus every seed; unreached stay NULL
        val spine = (adj.keysIterator ++ seedIds.iterator).toArray.distinct
        val spark = pairs.sparkSession
        val rows = spine.toSeq.map(n =>
          org.apache.spark.sql.Row(n, dist.get(n).map(Long.box).orNull))
        return spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("dist", LongType, nullable = true))))
      }
      val s0 = seeds.select(col(seedCol).cast(LongType).as("node")).distinct()
        .withColumn("dist", lit(0L)).localCheckpoint()
      var dist = s0
      var frontier = s0
      var h = 1L
      while (h <= maxHops && !frontier.isEmpty) {
        val nxt = frontier
          .join(edges, frontier("node") === edges("src"))
          .select(col("dst").as("node")).distinct()
          .join(dist, Seq("node"), "left_anti")
          .withColumn("dist", lit(h))
          .localCheckpoint() // materialized: probed, unioned, re-expanded
        dist = dist.unionAll(nxt)
        frontier = nxt
        h += 1
      }
      // spine: every graph node + every seed; unreached stay NULL.
      // Checkpointed EAGERLY (O(nodes), and the edge cache is still hot
      // from the loop) so the finally-unpersist below cannot force the
      // caller's action to replay the whole pair derivation for the
      // spine scan — the operator is eager throughout, so unlike the
      // lazy labelPropagation there is no reason to leave a cache
      // entry behind.
      val spine = edges.select(col("dst").as("node")).distinct()
        .unionAll(s0.select(col("node"))).distinct()
        .localCheckpoint()
      spine.join(dist, Seq("node"), "left")
        .select(col("node"), col("dist"))
    } finally { edges.unpersist(); () }
  }

  /** §2 row 164 — hop distance from one exemplar (min vec_id) per
    * label along the embedding near-dup graph, capped at 8 hops. */
  def seedDistanceQ(s: SparkSession, d: String): DataFrame = {
    val seeds = Tables.embeddings(s, d)
      .groupBy(col("label")).agg(min(col("vec_id")).as("node"))
      .select(col("node"))
    seedDistance(VectorQueries.embedNearDupFrame(s, d), "id_a", "id_b",
        seeds, "node", maxHops = 8)
      .orderBy(col("node"))
  }

  /** k-core peeling (SURVEY.md §2 row 174) — iteratively remove every
    * node whose degree among SURVIVORS is < k; what remains is the
    * k-core, the classic dense-subgraph backbone (Seidman 1983).
    * Curation reads it two ways: link-spam farms and bot rings live in
    * high-core regions their page-level features hide (each removal
    * can cascade — a node above threshold on the raw graph dies once
    * its weak neighbors peel), and a retrieval/similarity graph's core
    * is its "hub vocabulary". Returns (node, peel_round): the 1-based
    * round the node was peeled, NULL = in the core — the peel round is
    * a coreness proxy (earlier = further from the core), so the whole
    * cascade is the signal, not just membership.
    *
    * `rounds` caps the peel; the loop ALSO exits early once a round
    * removes nothing (peeling is monotone — an empty round fixes the
    * degrees forever, so early exit equals running all remaining
    * rounds). Parity needs no convergence claim: the capped peel is a
    * pure function of (edges, k, rounds) on BOTH engines, and extra
    * oracle rounds after fixpoint remove nothing by the same argument.
    *
    * Scale shape (the seedDistance posture): per round ONE equi-join
    * of the symmetrized edge frame against the O(nodes) survivor set
    * (dst side — removed sources drop out when the degree frame joins
    * back to survivors), one map-side-combined degree aggregation, one
    * left join + filter; survivor/removed state is localCheckpoint-
    * truncated per round and stays distributed; the driver holds only
    * the round counter and the per-round emptiness probe. Edges are
    * symmetrized + distinct'd ONCE, persisted across rounds. */
  // Fast-path bound: 2M symmetrized edges = 32 MB of primitive longs
  // collected (plus transient Row overhead) — comfortably inside the
  // driver budget, and the driver replay is O(rounds·|E|) integer ops
  // (milliseconds). CC's tighter 100k bound predates the byte math;
  // the peel/BFS replays hold only two long arrays and node-sized maps.
  private val PeelSmallGraphMax = 2000000L

  def kCorePeel(pairs: DataFrame, idACol: String, idBCol: String,
                k: Int, rounds: Int,
                smallGraphMax: Long = PeelSmallGraphMax): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val p0 = pairs.select(col(idACol).cast(LongType).as("a"),
        col(idBCol).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = p0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(p0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Small-graph fast path (the connectedComponents discipline —
      // bound CHECKED on the materialized count): the distributed peel
      // costs ~5 driver-scheduled jobs per round (degree shuffle +
      // broadcast + two checkpoints + probe; measured 33 jobs / ~4 s
      // at sf0.1). Under the bound, collect the symmetrized edge list
      // once and replay the SAME capped peel in the driver — degree
      // among survivors, remove < k, 1-based round labels, early exit
      // on an empty round — row-identical output; above the bound the
      // distributed loop below is unchanged.
      val edgeCount = edges.count() // materializes the persist the loop needs anyway
      if (edgeCount <= smallGraphMax) {
        val rowsA = edges.collect()
        val nE = rowsA.length
        val srcA = new Array[Long](nE)
        val dstA = new Array[Long](nE)
        var i = 0
        while (i < nE) { srcA(i) = rowsA(i).getLong(0); dstA(i) = rowsA(i).getLong(1); i += 1 }
        val spine = dstA.distinct
        val peeled = new scala.collection.mutable.HashMap[Long, Long]() // node -> round
        var surv = spine.toSet
        var liveIdx = Array.range(0, nE)
        var r = 1
        var fixed = false
        while (r <= rounds && !fixed) {
          val deg = new scala.collection.mutable.HashMap[Long, Long]()
          liveIdx.foreach { j => val s = srcA(j); deg(s) = deg.getOrElse(s, 0L) + 1L }
          // iterate SURVIVORS, not degree keys: a survivor whose last
          // neighbours were peeled in an earlier round has no live
          // edge at all (degree 0 < k) and must still be labelled —
          // exactly the distributed form's coalesce(dg, 0) < k
          val rem = surv.filter(n => deg.getOrElse(n, 0L) < k)
          if (rem.isEmpty) fixed = true
          else {
            rem.foreach(peeled(_) = r.toLong)
            surv --= rem
            liveIdx = liveIdx.filter(j => !rem.contains(srcA(j)) && !rem.contains(dstA(j)))
          }
          r += 1
        }
        val spark = pairs.sparkSession
        val rows = spine.toSeq.map(n =>
          org.apache.spark.sql.Row(n, peeled.get(n).map(Long.box).orNull))
        return spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("peel_round", LongType, nullable = true))))
      }
      // every node appears as dst after symmetrization
      val spine = edges.select(col("dst").as("node")).distinct()
        .localCheckpoint()
      var surv = spine
      var removed = spine.filter(lit(false))
        .withColumn("peel_round", lit(0L)).localCheckpoint()
      var r = 1
      var fixed = false
      while (r <= rounds && !fixed) {
        val sdst = surv.select(col("node").as("dst"))
        val deg = edges.join(sdst, Seq("dst"))
          .groupBy(col("src")).agg(count(lit(1)).as("dg"))
        val rem = surv.join(deg, surv("node") === deg("src"), "left")
          .filter(coalesce(col("dg"), lit(0L)) < k)
          .select(col("node"), lit(r.toLong).as("peel_round"))
          .localCheckpoint() // probed for emptiness, unioned, anti-joined
        if (rem.isEmpty) fixed = true
        else {
          removed = removed.unionAll(rem).localCheckpoint(eager = false)
          surv = surv.join(rem.select(col("node")), Seq("node"), "left_anti")
            .localCheckpoint() // consumed twice next round (dst filter + left join)
        }
        r += 1
      }
      spine.join(removed, Seq("node"), "left")
        .select(col("node"), col("peel_round"))
    } finally { edges.unpersist(); () }
  }

  /** The q_kcore graph: the bipartite customer–supplier purchase graph
    * (an edge per distinct trading pair), node ids disambiguated by
    * even/odd (2·custkey / 2·suppkey+1) — SF-proof, no offset to
    * outgrow. Dims broadcast; the fact join is the only big shuffle. */
  def purchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2L).as("ca"),
        (col("l_suppkey") * 2L + 1L).as("sb"))
      .distinct()
  }

  /** §2 row 174 — k=48 peel of the purchase graph, 6 capped rounds
    * (a 4-round cascade at sf0.01: a threshold chosen ABOVE the
    * typical customer degree so peeling customers starves suppliers,
    * the bipartite cascade k-core exists to catch). */
  def kCoreQ(s: SparkSession, d: String): DataFrame =
    kCorePeel(purchaseEdges(s, d), "ca", "sb", k = 48, rounds = 6)
      .orderBy(col("node"))

  /** §2 row 302 — HyperBall (Boldi–Vigna 2013, the HyperANF line): the
    * NEIGHBOURHOOD FUNCTION |B(v, r)| for every node at once — the
    * primitive behind harmonic centrality, effective-diameter and
    * spid on web graphs, where per-source BFS is n× too expensive and
    * exact multi-source state is O(n²). Each node carries an HLL
    * register vector of its ball; one radius step is
    * regs_r(v) = elementwise-max(regs_{r−1}(v), regs_{r−1}(w)) over
    * edges v→w — max-merge is idempotent/commutative/associative, so
    * the whole algorithm is |E|-bounded joins over O(n·m) integer
    * state, never pairs.
    *
    * Exactness posture (the [[graft.plans.HllRegistersAgg]] rule): the
    * oracle surface is the REGISTERS, not the float estimate — per
    * (node, radius) the register SUM and filled-count, both integers a
    * SQL replay reproduces bit-exactly (the registers are a pure
    * function of PolyHash64("hll|" + node) and the edge set). The
    * float cardinality estimate stays out of the gate by design.
    *
    * Scale shape: state rows are (node, bucket, reg) — SPARSE, ≤ n·m,
    * partitioned by (node, bucket); each radius is one edge equi-join
    * + one map-side-combinable max aggregation, localCheckpoint-pinned
    * (monotone state, re-read by the next round and the summary).
    * maxRadius bounds rounds; m = 2^p bounds per-node state at any
    * graph size. */
  def hyperBall(edges: DataFrame, srcCol: String, dstCol: String,
                p: Int = 4, maxRadius: Int = 3,
                smallGraphMax: Long = 2000000L): DataFrame = {
    require(p >= 2 && p <= 12, s"p must be in [2,12], got $p")
    require(maxRadius >= 0 && maxRadius <= 16,
      s"maxRadius must be in [0,16], got $maxRadius")
    val m = 1 << p
    val rhoCap = (64 - p + 1).toLong
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    // own-ball init: every node's registers hold exactly {node} — one
    // sparse row. bucket = low p bits (pmod = the oracle's
    // ((h % m) + m) % m), rho = trailing-zero rank of the unsigned
    // high bits (bit_count((w & -w) - 1) + 1, capped when w = 0)
    val h = graft.plans.PolyHash64.poly_hash64(
      concat(lit("hll|"), col("node").cast(StringType)))
    val w = shiftrightunsigned(h, p)
    val rho = when(w === 0L, lit(rhoCap))
      .otherwise((bit_count(w.bitwiseAND(-w) - 1) + 1).cast(LongType))
    try {
      // Small-graph fast path (the seedDistance discipline): the
      // distributed loop pays ~4 driver-scheduled jobs per radius over
      // register frames the driver replays in milliseconds. Bound is
      // register-aware (nodes·m dense longs ≤ ~2·edges·m): 4M/m edges
      // keeps the replay under ~100 MB. PolyHash64.compute is the SAME
      // static kernel codegen calls, pmod == ((h % m) + m) % m, and
      // bit_count((w & -w) - 1) + 1 == numberOfTrailingZeros(w) + 1 —
      // registers bit-identical; above the bound the loop below is
      // unchanged.
      if (e.count() <= math.min(smallGraphMax, 4000000L / m)) {
        val rows = e.collect()
        val nE = rows.length
        val srcA = new Array[Long](nE); val dstA = new Array[Long](nE)
        var i = 0
        while (i < nE) { srcA(i) = rows(i).getLong(0); dstA(i) = rows(i).getLong(1); i += 1 }
        val nodeIds = (srcA ++ dstA).distinct
        val idx = nodeIds.zipWithIndex.toMap
        var regs = Array.ofDim[Long](nodeIds.length, m) // 0 = absent (rho >= 1)
        nodeIds.foreach { nd =>
          val hv = graft.plans.PolyHash64.compute(
            org.apache.spark.unsafe.types.UTF8String.fromString(s"hll|$nd"))
          val bucket = (((hv % m) + m) % m).toInt
          val wv = hv >>> p
          val rhoV = if (wv == 0L) rhoCap
            else java.lang.Long.numberOfTrailingZeros(wv) + 1L
          regs(idx(nd))(bucket) = rhoV
        }
        val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        def emit(r: Int): Unit = nodeIds.foreach { nd =>
          val a = regs(idx(nd))
          var s = 0L; var nf = 0L; var j = 0
          while (j < m) { if (a(j) > 0L) { s += a(j); nf += 1L }; j += 1 }
          out += org.apache.spark.sql.Row(nd, r.toLong, s, nf)
        }
        emit(0)
        (1 to maxRadius).foreach { t =>
          val next = regs.map(_.clone())
          i = 0
          while (i < nE) {
            val si = idx(srcA(i)); val di = idx(dstA(i))
            var j = 0
            while (j < m) {
              if (regs(di)(j) > next(si)(j)) next(si)(j) = regs(di)(j)
              j += 1
            }
            i += 1
          }
          regs = next
          emit(t)
        }
        val spark = edges.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.parallelize(out.toSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("radius", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("reg_sum", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("n_filled", LongType, nullable = false))))
      }
      var state = nodes
        .select(col("node"), pmod(h, lit(m.toLong)).as("bucket"), rho.as("reg"))
        .localCheckpoint()
      def summary(st: DataFrame, r: Int): DataFrame =
        st.groupBy(col("node"))
          .agg(sum(col("reg")).as("reg_sum"), count(lit(1)).as("n_filled"))
          .withColumn("radius", lit(r.toLong))
      var out = summary(state, 0)
      for (t <- 1 to maxRadius) {
        val pulled = e.join(state, e("dst") === state("node"))
          .select(e("src").as("node"), col("bucket"), col("reg"))
        state = state.unionAll(pulled)
          .groupBy(col("node"), col("bucket"))
          .agg(max(col("reg")).as("reg"))
          .localCheckpoint()
        out = out.unionAll(summary(state, t))
      }
      out.select(col("node"), col("radius"), col("reg_sum"), col("n_filled"))
    // safe to drop here: every radius state is EAGERLY localCheckpoint-
    // pinned inside the loop, so the returned frame never re-reads `e`
    // (the kCorePeel/hits discipline — a session-lifetime cache entry
    // per call is the semanticGroups leak all over again)
    } finally { e.unpersist(); () }
  }

  /** §2 row 302 registered query — balls over the halving DAG
    * (doc → ⌊doc/2⌋ and ⌊doc/2⌋+1, the q_bib_coupling SF-stable seed:
    * out-degree ≤ 2 and in-degree ~4 at ANY corpus size, with real
    * multi-hop depth since every path funnels toward low ids). p = 4
    * (16 registers), radius ≤ 3. */
  def hyperBallQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val edges = docs.select(col("doc_id").as("src"),
        (col("doc_id") / 2).cast(LongType).as("dst"))
      .unionAll(docs.select(col("doc_id").as("src"),
        ((col("doc_id") / 2).cast(LongType) + 1).as("dst")))
    hyperBall(edges, "src", "dst", p = 4, maxRadius = 3)
      .orderBy(col("node"), col("radius"))
  }

  /** §2 row 305 — DETERMINISTIC random walks (the DeepWalk/node2vec
    * corpus generator): `walksPerNode` walks of up to `length` steps
    * from every node, the training sentences graph-embedding pipelines
    * feed to a skip-gram model. The "random" next-hop is the out-edge
    * minimizing PolyHash64("walk|" + start + "|" + walk + "|" + step +
    * "|" + dst) — uniform-ish over out-neighbours, but a pure function
    * of (graph, ids): replayable, partition-invariant, and no RNG
    * state to seed/coordinate across 1000 executors (the bootstrap
    * rule applied to graphs). Hash ties (p ≈ 2⁻⁶⁴) break to min dst —
    * the argmin is a lexicographic struct min, total either way. A
    * dead end (no out-edges) just ends the walk.
    *
    * Scale shape: frontier rows = nodes × walksPerNode, constant
    * across steps (each walk has ≤ 1 position); each step is ONE
    * edge equi-join keyed on the current node + a per-(start, walk)
    * min aggregate — per-step fan-out is the out-degree, the classic
    * frontier envelope, localCheckpoint-pinned like seedDistance.
    * Nothing is per-pair. */
  def deterministicWalks(edges: DataFrame, srcCol: String, dstCol: String,
                         walksPerNode: Int = 2, length: Int = 4,
                         smallGraphMax: Long = 2000000L): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 64,
      s"walksPerNode must be in [1,64], got $walksPerNode")
    require(length >= 1 && length <= 32, s"length must be in [1,32], got $length")
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    try {
      // Small-graph fast path (the seedDistance discipline): ~3 jobs
      // per step for frontiers the driver replays exactly —
      // PolyHash64.compute is the same static kernel, the argmin tie
      // order (h, dst) is the signed-long struct min, Long.toString
      // matches the long→string cast. Bound is output-aware: the
      // replay materializes nodes × walksPerNode × (length+1) rows.
      if (e.count() <= math.min(smallGraphMax, 2000000L / (walksPerNode.toLong * (length + 1)))) {
        val rowsA = e.collect()
        val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        rowsA.foreach { r =>
          adj.getOrElseUpdate(r.getLong(0), scala.collection.mutable.ArrayBuffer.empty) += r.getLong(1)
        }
        val nodeIds = (rowsA.map(_.getLong(0)) ++ rowsA.map(_.getLong(1))).distinct
        val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        nodeIds.foreach { nd =>
          (0 until walksPerNode).foreach { wk =>
            out += org.apache.spark.sql.Row(nd, wk.toLong, 0L, nd)
          }
        }
        var alive = nodeIds.flatMap(nd =>
          (0 until walksPerNode).map(wk => (nd, wk.toLong, nd))).toSeq
        (1 to length).foreach { t =>
          alive = alive.flatMap { case (start, wk, cur) =>
            adj.get(cur) match {
              case None => None // dead end: the walk just stops
              case Some(ds) =>
                var bestH = Long.MaxValue; var bestD = Long.MaxValue
                ds.foreach { d =>
                  val hv = graft.plans.PolyHash64.compute(
                    org.apache.spark.unsafe.types.UTF8String.fromString(
                      s"walk|$start|$wk|$t|$d"))
                  if (hv < bestH || (hv == bestH && d < bestD)) { bestH = hv; bestD = d }
                }
                out += org.apache.spark.sql.Row(start, wk, t.toLong, bestD)
                Some((start, wk, bestD))
            }
          }
        }
        val spark = edges.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.parallelize(out.toSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("start", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("walk", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("step", LongType, nullable = false),
            org.apache.spark.sql.types.StructField("node", LongType, nullable = false))))
      }
      var frontier = nodes
        .withColumn("walk", explode(array((0 until walksPerNode)
          .map(i => lit(i.toLong)): _*)))
        .select(col("node").as("start"), col("walk"),
          lit(0L).as("step"), col("node").as("cur"))
        .localCheckpoint()
      var out = frontier
      for (t <- 1 to length) {
        val h = graft.plans.PolyHash64.poly_hash64(concat(
          lit("walk|"), col("start").cast(StringType),
          lit("|"), col("walk").cast(StringType),
          lit("|"), lit(t.toLong).cast(StringType),
          lit("|"), col("dst").cast(StringType)))
        frontier = frontier
          .join(e, frontier("cur") === e("src"))
          .groupBy(col("start"), col("walk"))
          .agg(min(struct(h.as("h"), col("dst").as("d"))).as("__pick"))
          .select(col("start"), col("walk"), lit(t.toLong).as("step"),
            col("__pick").getField("d").as("cur"))
          .localCheckpoint()
        out = out.unionAll(frontier)
      }
      out.select(col("start"), col("walk"), col("step"), col("cur").as("node"))
    // every step's frontier is eagerly checkpointed, so the returned
    // union never re-reads `e` — same unpersist discipline as hyperBall
    } finally { e.unpersist(); () }
  }

  /** §2 row 305 registered query — 2 walks × 4 steps per node over
    * the halving DAG (the q_hyperball graph: out-degree ≤ 2, so every
    * step is a genuine hash-driven binary choice). */
  def walksQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val edges = docs.select(col("doc_id").as("src"),
        (col("doc_id") / 2).cast(LongType).as("dst"))
      .unionAll(docs.select(col("doc_id").as("src"),
        ((col("doc_id") / 2).cast(LongType) + 1).as("dst")))
    deterministicWalks(edges, "src", "dst", walksPerNode = 2, length = 4)
      .orderBy(col("start"), col("walk"), col("step"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank"      -> (pageRankQ _),
    "q_ppr"           -> (pprQ _),
    "q_triangles"     -> (trianglesQ _),
    "q_label_prop"    -> (labelPropQ _),
    "q_seed_distance" -> (seedDistanceQ _),
    "q_kcore"         -> (kCoreQ _),
    "q_hyperball"     -> (hyperBallQ _),
    "q_walks"         -> (walksQ _),
  )

  /** One unrolled PPR iteration — the iterSql twin with teleport and
    * dangling mass gated on seed membership. */
  private def pprIterSql(i: Int, p: Int): String =
    s"""c$i AS (
       |  SELECT e.dst AS node, SUM(${fd("r.rank * e.w", "e.ow")}) AS inc
       |  FROM ew e JOIN pk$p r ON e.src = r.node
       |  GROUP BY e.dst),
       |d$i AS (
       |  SELECT COALESCE(SUM(r.rank), 0) AS dm
       |  FROM pk$p r LEFT JOIN outw ow ON r.node = ow.src
       |  WHERE ow.src IS NULL),
       |pk$i AS MATERIALIZED (
       |  SELECT n.node,
       |    (CASE WHEN sd.node IS NOT NULL
       |          THEN ${fd("(100 - 85) * 1000000000000", "100 * ns.k")}
       |          ELSE 0 END)
       |    + ${fd(s"85 * (COALESCE(c.inc, 0) + (CASE WHEN sd.node IS NOT NULL THEN ${fd("d.dm", "ns.k")} ELSE 0 END))", "100")} AS rank
       |  FROM nodes n CROSS JOIN ns1 ns CROSS JOIN d$i d
       |  LEFT JOIN seeds sd ON n.node = sd.node
       |  LEFT JOIN c$i c ON n.node = c.node)""".stripMargin

  /** Textual floor-div macro for the oracle (b > 0). */
  private def fd(a: String, b: String) =
    s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"

  /** One unrolled iteration: contributions, dangling mass, damped
    * update — emits `rk$i` from `rk$p`. */
  private def iterSql(i: Int, p: Int): String =
    s"""c$i AS (
       |  SELECT e.dst AS node, SUM(${fd("r.rank * e.w", "e.ow")}) AS inc
       |  FROM ew e JOIN rk$p r ON e.src = r.node
       |  GROUP BY e.dst),
       |d$i AS (
       |  SELECT COALESCE(SUM(r.rank), 0) AS dm
       |  FROM rk$p r LEFT JOIN outw ow ON r.node = ow.src
       |  WHERE ow.src IS NULL),
       |rk$i AS MATERIALIZED (
       |  SELECT n.node,
       |    ${fd("(100 - 85) * 1000000000000", "100 * nn.n")}
       |      + ${fd(s"85 * (COALESCE(c.inc, 0) + ${fd("d.dm", "nn.n")})", "100")} AS rank
       |  FROM nodes n CROSS JOIN n1 nn CROSS JOIN d$i d
       |  LEFT JOIN c$i c ON n.node = c.node)""".stripMargin

  val oracles: Map[String, String] = Map(
    // triangle set is orientation-independent: the id-ordered 3-way
    // join over the canonical (u < w) near-dup edges replays the
    // degree-oriented closure's counts exactly
    "q_triangles" -> {
      val dot = VectorQueries.dotSql _
      s"""WITH v AS (SELECT label, vec_id, embedding, ${dot("embedding", "embedding")} AS nsq FROM embeddings),
         |e AS (
         |  SELECT a.vec_id AS u, b.vec_id AS w
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${dot("a.embedding", "b.embedding")} / greatest(sqrt(a.nsq) * sqrt(b.nsq), 1e-9) >= 0.3),
         |tri AS (
         |  SELECT e1.u AS a, e1.w AS b, e2.w AS c
         |  FROM e e1
         |  JOIN e e2 ON e2.u = e1.w
         |  JOIN e e3 ON e3.u = e1.u AND e3.w = e2.w)
         |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |  SELECT a AS node FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) t
         |GROUP BY node
         |ORDER BY n_tri DESC, node""".stripMargin
    },
    // exact unroll of the synchronous rounds: per round, neighbor
    // label counts then ROW_NUMBER over (count DESC, label ASC) —
    // identical to the engine's max(struct(c, -label)) argmax
    "q_label_prop" -> {
      val dot = VectorQueries.dotSql _
      def round(i: Int, p: Int): String =
        s"""ct$i AS (
           |  SELECT e.dst AS node, l.community AS lab, COUNT(*) AS c
           |  FROM ed e JOIN lp$p l ON e.src = l.node GROUP BY 1, 2),
           |lp$i AS MATERIALIZED (
           |  SELECT node, lab AS community FROM (
           |    SELECT node, lab, ROW_NUMBER() OVER (PARTITION BY node
           |      ORDER BY c DESC, lab ASC) AS rn
           |    FROM ct$i) t
           |  WHERE rn = 1)""".stripMargin
      s"""WITH v AS (SELECT label, vec_id, embedding, ${dot("embedding", "embedding")} AS nsq FROM embeddings),
         |pr AS (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${dot("a.embedding", "b.embedding")} / greatest(sqrt(a.nsq) * sqrt(b.nsq), 1e-9) >= 0.3),
         |ed AS (SELECT ia AS src, ib AS dst FROM pr UNION SELECT ib, ia FROM pr),
         |lp0 AS (SELECT DISTINCT dst AS node, dst AS community FROM ed),
         |${round(1, 0)},
         |${round(2, 1)},
         |${round(3, 2)},
         |${round(4, 3)}
         |SELECT node, community FROM lp4
         |ORDER BY node""".stripMargin
    },

    "q_pagerank" ->
      s"""WITH e AS (
         |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         |    1 + ${fd("COUNT(*) - 1", "1024")} AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |n1 AS (SELECT COUNT(*) AS n FROM nodes),
         |outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, e.w, o.ow FROM e JOIN outw o ON e.src = o.src),
         |rk0 AS (SELECT node, ${fd("1000000000000", "nn.n")} AS rank
         |        FROM nodes, n1 nn),
         |${iterSql(1, 0)},
         |${iterSql(2, 1)},
         |${iterSql(3, 2)}
         |SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank FROM rk3
         |ORDER BY node""".stripMargin,

    // same edge derivation; seeds = ASIA nations; teleport + dangling
    // mass land on seeds only, replayed by the gated unroll
    "q_ppr" ->
      s"""WITH e AS (
         |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         |    1 + ${fd("COUNT(*) - 1", "1024")} AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |seeds AS (
         |  SELECT DISTINCT n.n_nationkey AS node
         |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE r.r_name = 'ASIA'
         |    AND n.n_nationkey IN (SELECT node FROM nodes)),
         |ns1 AS (SELECT COUNT(*) AS k FROM seeds),
         |outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, e.w, o.ow FROM e JOIN outw o ON e.src = o.src),
         |pk0 AS (
         |  SELECT n.node,
         |    (CASE WHEN sd.node IS NOT NULL THEN ${fd("1000000000000", "ns.k")}
         |          ELSE 0 END) AS rank
         |  FROM nodes n CROSS JOIN ns1 ns
         |  LEFT JOIN seeds sd ON n.node = sd.node),
         |${pprIterSql(1, 0)},
         |${pprIterSql(2, 1)},
         |${pprIterSql(3, 2)}
         |SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank FROM pk3
         |ORDER BY node""".stripMargin,

    // exact unroll of the 6 capped peel rounds; every CTE MATERIALIZED
    // (an unmaterialized chain re-derives its ancestors per reference —
    // exponential in rounds on DuckDB 1.0). Degree counts only filter
    // the dst side, like the engine: a removed src's degree row is
    // dropped by the survivor left join, never consumed.
    "q_kcore" -> {
      def round(i: Int, p: Int): String =
        s"""d$i AS MATERIALIZED (
           |  SELECT e.src AS node, COUNT(*) AS dg
           |  FROM ed e JOIN s$p b ON e.dst = b.node GROUP BY 1),
           |r$i AS MATERIALIZED (
           |  SELECT s.node, CAST($i AS BIGINT) AS peel_round
           |  FROM s$p s LEFT JOIN d$i d ON s.node = d.node
           |  WHERE COALESCE(d.dg, 0) < 48),
           |s$i AS MATERIALIZED (
           |  SELECT node FROM s$p EXCEPT SELECT node FROM r$i)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey * 2 AS ca, l.l_suppkey * 2 + 1 AS sb
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |ed AS MATERIALIZED (
         |  SELECT ca AS src, sb AS dst FROM e0 UNION SELECT sb, ca FROM e0),
         |s0 AS MATERIALIZED (SELECT DISTINCT dst AS node FROM ed),
         |${round(1, 0)},
         |${round(2, 1)},
         |${round(3, 2)},
         |${round(4, 3)},
         |${round(5, 4)},
         |${round(6, 5)},
         |peeled AS (
         |  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
         |  SELECT * FROM r3 UNION ALL SELECT * FROM r4 UNION ALL
         |  SELECT * FROM r5 UNION ALL SELECT * FROM r6)
         |SELECT CAST(s.node AS BIGINT) AS node, p.peel_round
         |FROM s0 s LEFT JOIN peeled p ON s.node = p.node
         |ORDER BY s.node""".stripMargin
    },

    // layered BFS == min(dist) over the hop-capped recursive walk:
    // each node's first discovery is its true shortest hop, so the
    // UNION-deduped (node, dist) closure under dist < 8 replays the
    // frontier loop exactly; the spine LEFT JOIN keeps unreached
    // nodes as NULL rows, matching the engine. ed/spine dedup via
    // explicit DISTINCT subqueries, NOT bare UNION: DuckDB 1.0 fails
    // to dedup a non-recursive UNION CTE inside WITH RECURSIVE
    // (observed: seed nodes doubled in spine).
    "q_seed_distance" -> {
      val dot = VectorQueries.dotSql _
      s"""WITH RECURSIVE
         |v AS (SELECT label, vec_id, embedding, ${dot("embedding", "embedding")} AS nsq FROM embeddings),
         |pr AS (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${dot("a.embedding", "b.embedding")} / greatest(sqrt(a.nsq) * sqrt(b.nsq), 1e-9) >= 0.3),
         |ed AS (SELECT DISTINCT src, dst FROM
         |  (SELECT ia AS src, ib AS dst FROM pr UNION ALL SELECT ib, ia FROM pr) t0),
         |seeds AS (SELECT CAST(MIN(vec_id) AS BIGINT) AS node FROM embeddings GROUP BY label),
         |walk(node, dist) AS (
         |  SELECT node, CAST(0 AS BIGINT) FROM seeds
         |  UNION
         |  SELECT e.dst, w.dist + 1
         |  FROM walk w JOIN ed e ON e.src = w.node
         |  WHERE w.dist < 8),
         |best AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node),
         |spine AS (SELECT DISTINCT node FROM
         |  (SELECT dst AS node FROM ed UNION ALL SELECT node FROM seeds) t1)
         |SELECT CAST(sp.node AS BIGINT) AS node, CAST(b.dist AS BIGINT) AS dist
         |FROM spine sp LEFT JOIN best b ON sp.node = b.node
         |ORDER BY sp.node""".stripMargin
    },

    // HyperBall replay: own-ball registers from the shared PolyHash64
    // fragment (the q_hll_registers bucket/rho derivation verbatim),
    // then each radius unrolled as one max-merge CTE pulling successor
    // registers along the edges — sparse rows throughout, so COUNT(*)
    // is the filled-register count on both sides. p = 4, radius <= 3.
    "q_hyperball" -> {
      val m = 1 << 4
      val rhoCap = 64 - 4 + 1
      def step(i: Int): String =
        s"""r$i AS (
           |  SELECT node, bucket, MAX(reg) AS reg FROM (
           |    SELECT * FROM r${i - 1}
           |    UNION ALL
           |    SELECT e.src AS node, r.bucket, r.reg
           |    FROM ed e JOIN r${i - 1} r ON r.node = e.dst) u$i
           |  GROUP BY 1, 2)""".stripMargin
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |ed AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, doc_id // 2 AS dst FROM docs
         |    UNION ALL
         |    SELECT doc_id, doc_id // 2 + 1 FROM docs) e0
         |  WHERE src <> dst),
         |nv AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) n0),
         |hs AS (${TrainingOps.polyHashOverSql("node",
                "SELECT node, 'hll|' || CAST(node AS VARCHAR) AS t FROM nv")}),
         |r0 AS (
         |  SELECT node, CAST(((h % $m) + $m) % $m AS BIGINT) AS bucket,
         |    CAST(CASE WHEN w = 0 THEN $rhoCap
         |         ELSE bit_count((w & (-w)) - 1) + 1 END AS BIGINT) AS reg
         |  FROM (
         |    SELECT node, h, CAST(
         |      (CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + 18446744073709551616
         |            ELSE CAST(h AS HUGEINT) END) // $m AS BIGINT) AS w
         |    FROM hs) w0),
         |${step(1)},
         |${step(2)},
         |${step(3)}
         |SELECT node, radius, CAST(SUM(reg) AS BIGINT) AS reg_sum,
         |  COUNT(*) AS n_filled
         |FROM (
         |  SELECT node, CAST(0 AS BIGINT) AS radius, reg FROM r0
         |  UNION ALL SELECT node, 1, reg FROM r1
         |  UNION ALL SELECT node, 2, reg FROM r2
         |  UNION ALL SELECT node, 3, reg FROM r3) allr
         |GROUP BY 1, 2
         |ORDER BY node, radius""".stripMargin
    },

    // walk replay: per step, hash every out-edge of the walk's current
    // node and take the two-phase argmin (min h, then min dst at that
    // h — equals the engine's lexicographic struct min)
    "q_walks" -> {
      def step(i: Int): String =
        s"""h$i AS (${TrainingOps.polyHashOverSql("start, walk, dst",
             s"SELECT f.start, f.walk, e.dst, 'walk|' || CAST(f.start AS VARCHAR) || '|' || CAST(f.walk AS VARCHAR) || '|$i|' || CAST(e.dst AS VARCHAR) AS t FROM f${i - 1} f JOIN ed e ON e.src = f.cur")}),
           |m$i AS (SELECT start, walk, MIN(h) AS mh FROM h$i GROUP BY 1, 2),
           |f$i AS (
           |  SELECT h.start, h.walk, CAST($i AS BIGINT) AS step,
           |    MIN(h.dst) AS cur
           |  FROM h$i h JOIN m$i m
           |    ON m.start = h.start AND m.walk = h.walk AND h.h = m.mh
           |  GROUP BY 1, 2)""".stripMargin
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |ed AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, doc_id // 2 AS dst FROM docs
         |    UNION ALL
         |    SELECT doc_id, doc_id // 2 + 1 FROM docs) e0
         |  WHERE src <> dst),
         |nv AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) n0),
         |f0 AS (
         |  SELECT node AS start, CAST(w AS BIGINT) AS walk,
         |    CAST(0 AS BIGINT) AS step, node AS cur
         |  FROM nv CROSS JOIN (SELECT unnest(range(0, 2)) AS w) ws),
         |${step(1)},
         |${step(2)},
         |${step(3)},
         |${step(4)}
         |SELECT start, walk, step, cur AS node FROM (
         |  SELECT * FROM f0 UNION ALL SELECT * FROM f1
         |  UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
         |  UNION ALL SELECT * FROM f4) allf
         |ORDER BY start, walk, step""".stripMargin
    },
  )
}
