package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Embedding similarity operators (SURVEY.md §2.3 #39-41).
  *
  * Brute-force top-k broadcasts the (small) query set against the
  * candidate corpus — a map-side-only scored scan plus one window for
  * the per-query top-k; this is the exact baseline. The scale path is
  * random-hyperplane LSH: bucket ids are per-row expressions, the
  * bucket join is an equi-join, so candidate count tracks bucket
  * collisions instead of |Q|×|C|.
  */
object VectorOps {

  /** Add an exact squared-norm column (compute once, before any join). */
  def withNormSq(df: DataFrame, vecCol: String, out: String = "nsq"): DataFrame =
    df.withColumn(out, normSqDec(col(vecCol)).cast(DoubleType))

  /** Quantized vector + squared norm, computed once per row. Joins then
    * pay only long multiply-adds per pair. */
  private def prepared(df: DataFrame, idCol: String, vecCol: String,
                       idOut: String, qvOut: String, nsqOut: String): DataFrame =
    df.select(col(idCol).as(idOut), quantize(col(vecCol)).as(qvOut))
      .withColumn(nsqOut, dotQuantized(col(qvOut), col(qvOut)).cast(DoubleType))

  /** Shared ranking tail: per-query top-k by cosine desc, cid
    * tiebreak. One place so the exact/LSH/IVF paths cannot drift. */
  def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
  }

  /** Hard-negative mining (SURVEY.md §2 row 156) — the contrastive-
    * training data op: for each anchor, the k most-similar corpus
    * vectors with a DIFFERENT label. Those are exactly the pairs a
    * triplet/contrastive loss learns most from — easy negatives (far,
    * different label) contribute ~zero gradient, and random sampling
    * finds almost only easy ones; mining the near-but-wrong ones is
    * what the embedding-training pipelines this library feeds do at
    * scale.
    *
    * Shape mirrors [[bruteForceTopK]]: the ANCHOR BATCH broadcasts
    * (caller batches anchors — the corpus scans once per batch, never
    * self-joins), labels ride the prepared frames, the different-label
    * filter applies BEFORE ranking (an anchor's own row drops there
    * too), and ranking uses the same (cos DESC, cid) order contract as
    * [[topKByCosine]]. At corpus×corpus scale, feed `candidates` from
    * the IVF cells (row 107) or LSH buckets (row 41) instead of the
    * full table — mining tolerates approximate candidates by
    * construction (a missed near-negative costs a training pair, not
    * correctness).
    */
  def mineHardNegatives(candidates: DataFrame, anchors: DataFrame,
                        idCol: String, vecCol: String, labelCol: String,
                        k: Int): DataFrame = {
    val c = candidates.select(col(idCol).as("cid"), col(labelCol).as("c_lbl"),
        quantize(col(vecCol)).as("c_qv"))
      .withColumn("c_nsq", dotQuantized(col("c_qv"), col("c_qv")).cast(DoubleType))
    val q = anchors.select(col(idCol).as("qid"), col(labelCol).as("q_lbl"),
        quantize(col(vecCol)).as("q_qv"))
      .withColumn("q_nsq", dotQuantized(col("q_qv"), col("q_qv")).cast(DoubleType))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_lbl") =!= col("q_lbl"))
      .withColumn("cos", cosineFrom(
        dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType),
        col("q_nsq"), col("c_nsq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col("q_lbl"), col("cid"), col("c_lbl"),
        col("cos"), col("rn"))
  }

  /** Fails fast when the declared dim does not match the data: a
    * mismatch would null the hyperplane dots and collapse every row
    * into one bucket (full cross product) — silently. */
  def requireDim(df: DataFrame, vecCol: String, dim: Int): Unit = {
    val first = df.select(size(col(vecCol))).limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"vector dataset is empty — cannot validate dim of column '$vecCol'"))
    require(first.getInt(0) == dim,
      s"vector dim ${first.getInt(0)} != declared dim $dim")
  }

  /** Full-scan guard for untrusted vector magnitudes: quantized dots
    * overflow Long silently past `VectorFunctions.maxSafeAbs(dim)` (see
    * the bound derivation there). One agg over the dataset — call once
    * per corpus before indexing, not per query. */
  def requireMagnitude(df: DataFrame, vecCol: String, dim: Int): Unit = {
    val bound = graft.functions.VectorFunctions.maxSafeAbs(dim)
    val worst = df.agg(
      max(array_max(transform(col(vecCol), x => abs(x.cast(DoubleType))))))
      .collect().headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
      .getOrElse(0d)
    require(worst <= bound,
      f"vector magnitude $worst%.3g exceeds quantized-dot overflow bound $bound%.3g for dim $dim")
  }

  /** §2.3#40 — exact cosine top-k of each query vector against the
    * candidates. `queries` must be broadcast-small. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = prepared(candidates, idCol, vecCol, "cid", "c_qv", "c_nsq")
    val q = prepared(queries, idCol, vecCol, "qid", "q_qv", "q_nsq")
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", cosineFrom(
        dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType), col("q_nsq"), col("c_nsq")))
    topKByCosine(scored, k)
  }

  /** §2.3#39 — near-duplicate pairs by cosine within equi-join blocks
    * (blocking column keeps the pair space linear-ish at scale). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        quantize(col(vecCol)).as("qv"))
      .withColumn("nsq", dotQuantized(col("qv"), col("qv")).cast(DoubleType))
    val a = v.select(col("blk"), col("id").as("id_a"), col("qv").as("qv_a"), col("nsq").as("nsq_a"))
    val b = v.select(col("blk").as("blk_b"), col("id").as("id_b"), col("qv").as("qv_b"), col("nsq").as("nsq_b"))
    a.join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b"))
      .withColumn("cos", cosineFrom(
        dotQuantized(col("qv_a"), col("qv_b")).cast(DoubleType), col("nsq_a"), col("nsq_b")))
      .filter(col("cos") >= threshold)
      .select(col("blk").as("block"), col("id_a"), col("id_b"), col("cos"))
  }

  /** Mutual-kNN pairs with margin scoring (SURVEY.md §2 row 186) —
    * the high-precision matching rule mining pipelines layer on raw
    * cosine: a pair counts only if each side is in the OTHER's top-k
    * (mutual nearest neighbors), scored by the margin criterion
    * cos(a,b) relative to the mean of both sides' top-k cosines
    * (Artetxe & Schwenk 2019's ratio margin — the bitext-mining
    * scorer; absolute cosine thresholds fail because "how close is
    * close" varies per neighborhood, and hubness makes some vectors
    * everyone's neighbor without being anyone's match).
    *
    * Exactness: cosines are floored onto a 1e12 integer image
    * (the BM25 integer-score-image trick), so top-k ranking, the
    * top-k SUMS (order-free integer addition — a double sum would
    * depend on reduction order) and the margin itself are exact:
    * margin = icos·(cnt_a + cnt_b) / (isum_a + isum_b), emitted as
    * the integer pair, divide at display. cnt handles rims smaller
    * than k. Image headroom: icos ≤ 1e12, num ≤ 2k·1e12.
    *
    * Scale shape: rides the SAME blocking as [[nearDupPairs]] (pair
    * space linear-ish per block, equi-join on the block key); the
    * top-k rank is a per-(block, src) window whose partitions are
    * block-bounded; top-k stats are a map-side-combined aggregation;
    * mutuality is ONE self-equi-join of the k-bounded edge frame. */
  def mutualKnnMargin(df: DataFrame, idCol: String, vecCol: String,
                      blockCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        quantize(col(vecCol)).as("qv"))
      .withColumn("nsq", dotQuantized(col("qv"), col("qv")).cast(DoubleType))
    val a = v.select(col("blk"), col("id").as("src"), col("qv").as("qv_a"), col("nsq").as("nsq_a"))
    val b = v.select(col("blk").as("blk_b"), col("id").as("dst"), col("qv").as("qv_b"), col("nsq").as("nsq_b"))
    val w = Window.partitionBy(col("blk"), col("src"))
      .orderBy(col("icos").desc, col("dst"))
    val edges = a.join(b, col("blk") === col("blk_b") && col("src") =!= col("dst"))
      .withColumn("icos", floor(cosineFrom(
        dotQuantized(col("qv_a"), col("qv_b")).cast(DoubleType),
        col("nsq_a"), col("nsq_b")) * 1000000000000L).cast(LongType))
      .select(col("blk"), col("src"), col("dst"), col("icos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = edges.groupBy(col("blk"), col("src"))
      .agg(sum(col("icos")).as("isum"), count(lit(1)).as("cnt"))
    val mutual = edges.filter(col("src") < col("dst"))
      .join(edges.select(col("blk").as("blk2"), col("src").as("src2"),
          col("dst").as("dst2")),
        col("blk") === col("blk2") && col("dst") === col("src2") &&
          col("src") === col("dst2"))
      .select(col("blk"), col("src").as("id_a"), col("dst").as("id_b"), col("icos"))
    mutual
      .join(stats.select(col("blk"), col("src").as("id_a"),
        col("isum").as("isum_a"), col("cnt").as("cnt_a")), Seq("blk", "id_a"))
      .join(stats.select(col("blk"), col("src").as("id_b"),
        col("isum").as("isum_b"), col("cnt").as("cnt_b")), Seq("blk", "id_b"))
      .select(col("blk").as("block"), col("id_a"), col("id_b"), col("icos"),
        (col("icos") * (col("cnt_a") + col("cnt_b"))).as("margin_num"),
        (col("isum_a") + col("isum_b")).as("margin_den"))
  }

  /** kNN label-noise audit (SURVEY.md §2 row 207) — the confident-
    * learning screen (Northcutt et al. 2021's intuition in its
    * non-parametric form): a vector whose nearest neighbors
    * overwhelmingly carry a DIFFERENT label is either mislabeled or
    * sits on a class boundary — either way it is exactly what a label-
    * quality pass reviews before the labels train a filter. Per
    * audited vector: its k nearest pool neighbors by the exact 1e12-
    * floored integer cosine (the row-186 image — ranking and counts
    * replay bit-exactly), the disagreement count, and the neighbor-
    * MAJORITY label (count ties → smallest label) as the suggested
    * relabel. The audited set is a caller predicate — auditing is
    * cheap on a sample and the suspects, not the corpus.
    *
    * Scale shape: this is the BRUTE path (audited × pool via one
    * broadcast nested-loop of the audited side) — correct-by-
    * construction and right for audit-sized samples; at corpus scale
    * swap the pair source for the row-41/163 IVF/LSH bucketed
    * candidates, the downstream (rank window per audited id, two
    * k-bounded aggregations) is unchanged. */
  def labelNoiseAudit(df: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, auditPred: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = df.select(col(idCol).as("id"), col(labelCol).cast(LongType).as("lbl"),
        quantize(col(vecCol)).as("qv"))
      .withColumn("nsq", dotQuantized(col("qv"), col("qv")).cast(DoubleType))
    val a = df.filter(auditPred)
      .select(col(idCol).as("src"), col(labelCol).cast(LongType).as("lbl_a"),
        quantize(col(vecCol)).as("qv_a"))
      .withColumn("nsq_a", dotQuantized(col("qv_a"), col("qv_a")).cast(DoubleType))
    val w = Window.partitionBy(col("src")).orderBy(col("icos").desc, col("dst"))
    val edges = v.join(broadcast(a), col("src") =!= col("id"))
      .withColumn("icos", floor(cosineFrom(
        dotQuantized(col("qv_a"), col("qv")).cast(DoubleType),
        col("nsq_a"), col("nsq")) * 1000000000000L).cast(LongType))
      .select(col("src"), col("lbl_a"), col("id").as("dst"), col("lbl"), col("icos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    edges.groupBy(col("src"), col("lbl_a"), col("lbl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("src"), col("lbl_a"))
      .agg(sum(col("cnt")).as("n_nb"),
        coalesce(sum(when(col("lbl") =!= col("lbl_a"), col("cnt"))), lit(0L))
          .as("n_disagree"),
        min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("m"))
      .select(col("src").as("vec_id"), col("lbl_a").as("label"),
        col("n_nb"), col("n_disagree"), col("m.l").as("nb_majority"))
  }

  /** Embedding snapshot drift, per dimension (SURVEY.md §2 row 222) —
    * the VECTOR-space companion to row 182's token drift: two corpus
    * snapshots (or an old vs re-run encoder) can agree on every token
    * statistic while the embedding distribution moves — and a moved
    * centroid silently invalidates every IVF/PQ index and cached
    * nearest-neighbor result trained on the old geometry. Per
    * dimension: the two snapshots' vector counts and exact integer
    * coordinate sums (the 1e6 quantized image — order-free addition),
    * and the mean difference as the cross-multiplied integer pair
    * (sum_a·n_b − sum_b·n_a, n_a·n_b) — the per-dimension drift
    * localization a single cosine number can't give (which dims
    * moved → which subspace the re-index must care about). Overflow:
    * |Σq| ≤ n·1e6 ⇒ cross products need n_a·n_b·1e6 < 2^63 — n ≲ 3e6
    * per snapshot at full precision, pre-scale beyond.
    *
    * Scale shape: one posexplode to (snap, dim, q) — map-side combined
    * into a |dims|-bounded frame; zero joins, zero windows. */
  def snapshotDrift(df: DataFrame, idCol: Column, vecCol: String,
                    snapCol: Column): DataFrame =
    df.select(snapCol.cast(LongType).as("snap"),
        posexplode(quantize(col(vecCol))).as(Seq("dim", "q")))
      .groupBy(col("dim"))
      .agg(coalesce(sum(when(col("snap") === 0L, 1L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("snap") =!= 0L, 1L)), lit(0L)).as("n_b"),
        coalesce(sum(when(col("snap") === 0L, col("q"))), lit(0L)).as("sum_a"),
        coalesce(sum(when(col("snap") =!= 0L, col("q"))), lit(0L)).as("sum_b"))
      .select(col("dim").cast(LongType).as("dim"), col("n_a"), col("n_b"),
        col("sum_a"), col("sum_b"),
        (col("sum_a") * col("n_b") - col("sum_b") * col("n_a")).as("drift_num"),
        (col("n_a") * col("n_b")).as("drift_den"))

  /** Johnson–Lindenstrauss random projection (SURVEY.md §2 row 191) —
    * reduce embedding dimensionality with a DATA-INDEPENDENT random
    * matrix: JL guarantees pairwise distances survive to (1±ε) at
    * outDim = O(log n / ε²) regardless of the data, which makes it the
    * zero-training, zero-state companion to row 168's PCA (PCA needs a
    * corpus pass and a model; JL needs a seed — the right tool when
    * the corpus streams or the model must not depend on it). The
    * standard pre-step before ANN indexing at 100 TB: distance math on
    * 16 dims costs 1/4 of 64.
    *
    * Exactness: the projection matrix derives from the splitmix64
    * hyperplane generator (deterministic, seed-keyed) QUANTIZED to
    * integer literals at 1e3 — the same constants enter both engines
    * (the Bm25Queries constant-workload rule), vectors ride the
    * library-standard 1e6 integer image, so every projected coordinate
    * is an exact integer dot (headroom: 64 dims · 1e3 · ~5e6 ≈ 3e11).
    * A scaled-integer projection is still a JL projection — the
    * distortion bound cares about the distribution shape, not the
    * scale.
    *
    * Scale shape: pure per-row projection (outDim codegen'd dot
    * kernels against literal arrays), zero shuffles beyond the
    * caller's sink; emitted long form (id, dim, value). */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                inDim: Int, outDim: Int, seed: Long = 7L): DataFrame = {
    require(outDim >= 1 && inDim >= 1, "dims must be >= 1")
    val r = jlMatrix(inDim, outDim, seed)
    val qv = quantize(col(vecCol))
    val coords = r.map { row =>
      graft.plans.VectorKernels.dot_long(qv, array(row.map(lit): _*)) }
    df.select(col(idCol).as("id"),
        posexplode(array(coords: _*)).as(Seq("dim", "value")))
      .select(col("id"), col("dim").cast(LongType).as("dim"), col("value"))
  }

  /** The integer projection matrix (outDim rows × inDim cols) — shared
    * verbatim with the oracle's VALUES table. */
  private[graft] def jlMatrix(inDim: Int, outDim: Int, seed: Long): Seq[Seq[Long]] =
    hyperplanes(outDim, inDim, seed)
      .map(_.map(d => math.floor(d * 1000).toLong))

  // ---- LSH (random hyperplanes) ----------------------------------------

  private def mix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4ecda9226d4e9L
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64-derived,
    * reproducible across runs — required for resumable pipelines). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map { i =>
      val h = mix64(seed + p.toLong * 131071L + i)
      (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
    })

  /** INTEGER LSH planes: the same splitmix stream as [[hyperplanes]],
    * collapsed to 21-bit signed components (`h >> 43`, in
    * [-2^20, 2^20)). Integer planes dotted with the QUANTIZED vector
    * keep the bucket's sign decision in exact long arithmetic — a SQL
    * oracle replays every bucket bit-for-bit from a literal VALUES
    * table (the jlMatrix discipline applied to bucketing), where the
    * former double-plane dot could flip a sign in the last ulp across
    * engines' summation orders. No overflow at any accepted scale:
    * |qv_i| ≤ 1e6-scale, |plane_i| < 2^20, 64 terms ≈ 7e13 ≪ 2^63. */
  def lshPlanesInt(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Long]] =
    (0 until numPlanes).map(p => (0 until dim).map { i =>
      mix64(seed + p.toLong * 131071L + i) >> 43
    })

  /** Sign-bit bucket id of a QUANTIZED vector under integer planes
    * (per-row expression, no shuffle). Plane dots run through the
    * codegen'd ArrayDotLong kernel — exact integer sign bits. */
  def lshBucket(qvCol: Column, planes: Seq[Seq[Long]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val dot = graft.plans.VectorKernels.dot_long(qvCol, array(p.map(lit): _*))
      when(dot >= 0, lit(1L << j)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** Multi-table LSH buckets over a QUANTIZED vector: `tables`
    * independent hash tables of `planesPerTable` integer hyperplanes
    * each. One row per (vector, table) — union-by-explode keeps the
    * join equi-shaped. Multi-table is the standard recall lever: a
    * true neighbor only needs to collide in ONE table. */
  def lshBuckets(qvCol: Column, tables: Int, planesPerTable: Int, dim: Int): Column =
    array((0 until tables).map { t =>
      val planes = lshPlanesInt(planesPerTable, dim, seed = 42L + t * 7919L)
      struct(lit(t).as("tbl"), lshBucket(qvCol, planes).as("h"))
    }: _*)

  /** §2.3#41 — approximate top-k: candidates colliding with the query in
    * any of the LSH tables, ranked by exact cosine, deduped per pair. */
  def lshTopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              tables: Int = 8, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    requireDim(candidates, vecCol, dim)
    val c = prepared(candidates, idCol, vecCol, "cid", "c_qv", "c_nsq")
      .withColumn("bucket", explode(lshBuckets(col("c_qv"), tables, planesPerTable, dim)))
    val q = prepared(queries, idCol, vecCol, "qid", "q_qv", "q_nsq")
      .withColumn("bucket", explode(lshBuckets(col("q_qv"), tables, planesPerTable, dim)))
    val cands = c.join(broadcast(q), "bucket")
      .select(col("qid"), col("cid"), col("q_qv"), col("c_qv"), col("q_nsq"), col("c_nsq"))
      .dropDuplicates("qid", "cid")
    val scored = cands.withColumn("cos", cosineFrom(
      dotQuantized(col("q_qv"), col("c_qv")).cast(DoubleType), col("q_nsq"), col("c_nsq")))
    topKByCosine(scored, k)
  }
}
