package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._
import graft.plans.PolyHash64
import graft.sources.Tables

/** Semantic deduplication (SURVEY.md §2.7) — the SemDeDup recipe
  * (Abbas et al. 2023): cluster the embedding space coarsely, then
  * find near-duplicate GROUPS only within clusters (cosine >= t →
  * connected components → canonical min-id per group). Cluster
  * blocking turns the quadratic all-pairs search into per-cluster
  * blocks, the same candidate-bounding role LSH bands play for text.
  *
  * Two cluster paths:
  *  - `refine = true` (library scale path): Lloyd-refined k-means
  *    centroids ([[IvfIndex.trainCentroids]], bounded driver sample) —
  *    better-shaped blocks, deterministic, spec-verified.
  *  - `refine = false` (oracle-parity path): the k data vectors with
  *    the smallest `poly_hash64('semcl|' || id)` act directly as
  *    centroids (zero Lloyd steps). Seed choice, quantized-L2
  *    assignment, and quantized-cosine pairing are all integer math —
  *    the whole operator replays exactly in DuckDB.
  *
  * Scale shape (100 TB): seeds/centroids are a k-row broadcast;
  * assignment is one broadcast nested-loop scoring pass (O(n·k), no
  * shuffle) plus a map-side-combined argmin; the pair join shuffles on
  * cluster id only. CC is the shared [[Dedup.connectedComponents]]
  * (delta-capable, checkpoint-truncated). No driver state beyond the
  * k-row model — the IVF bounded-driver-model posture.
  */
object SemDedup {

  /** The k rows with the smallest replayable id hash, as (sid, s_qv,
    * s_nsq) — quantized once, broadcast-sized by construction. */
  def hashSeeds(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = PolyHash64.poly_hash64(concat(lit("semcl|"), col(idCol).cast(StringType)))
    df.select(col(idCol).as("sid"), quantize(col(vecCol)).as("s_qv"), h.as("__h"))
      .orderBy(col("__h"), col("sid"))
      .limit(k)
      .withColumn("s_nsq", dotQuantized(col("s_qv"), col("s_qv")))
      .drop("__h")
  }

  /** Nearest-seed assignment by quantized squared L2 (exact longs:
    * ||a-s||² = nsq_a + nsq_s − 2·a·s), ties to the lowest seed id.
    * Returns (id, cluster, qv, nsq) so the pair stage re-uses the
    * quantization. */
  def assignClusters(df: DataFrame, idCol: String, vecCol: String,
                     seeds: DataFrame): DataFrame = {
    val v = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("nsq", dotQuantized(col("qv"), col("qv")))
    v.crossJoin(broadcast(seeds))
      .withColumn("__d2",
        col("nsq") + col("s_nsq") - lit(2L) * dotQuantized(col("qv"), col("s_qv")))
      .groupBy(col("id"))
      .agg(min(struct(col("__d2"), col("sid"))).as("__m"),
        first(col("qv")).as("qv"), first(col("nsq")).as("nsq"))
      .select(col("id"), col("__m.sid").as("cluster"), col("qv"), col("nsq"))
  }

  /** Semantic near-dup groups: (id, cluster, group_id) for EVERY input
    * row — group_id is the min reachable id in the within-cluster
    * cosine graph at `threshold`; singletons keep their own id. Keep
    * the canonical representative with `group_id == id`. */
  def semanticGroups(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, threshold: Double,
                     refine: Boolean = false,
                     checkpoint: Boolean = true): DataFrame = {
    // persisted: the O(n·k) scoring + argmin pass feeds THREE consumers
    // (both sides of the pair self-join and the final label join) —
    // the same multi-consumer discipline Dedup applies to its state
    // frames; without it the assignment recomputes per consumer
    val assigned = (
      if (refine) {
        val centroids = IvfIndex.trainCentroids(df, idCol, vecCol, k, iters = 2)
        df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
            IvfIndex.nearestCentroid(col(vecCol), centroids).as("cluster"))
          .withColumn("nsq", dotQuantized(col("qv"), col("qv")))
      } else assignClusters(df, idCol, vecCol, hashSeeds(df, idCol, vecCol, k))
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pairs = scoredPairs(assigned, assigned, threshold,
        selfPairs = true)
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    // connectedComponents is eager (it iterates), so the cache is hot
    // here; localCheckpoint materializes the final (3-long-column)
    // result while it still is, which lets us unpersist the fat
    // assignment frame (qv arrays) before returning instead of leaving
    // it in the cache manager for the session's lifetime — checkpoint
    // blocks free with GC once the caller drops the frame.
    // `checkpoint = false` keeps the frame lazy (lineage intact) for
    // plan inspection (PlanSpec pins the broadcast/blocked-join shape,
    // which a checkpointed frame hides behind Scan ExistingRDD).
    val joined = assigned.select(col("id"), col("cluster"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("comp"), col("id")).as("group_id"))
    if (!checkpoint) {
      // no checkpoint → no materialization boundary to hide behind:
      // release the cache entry now (an action on the returned frame
      // recomputes the assignment — this path exists for plan
      // inspection, not execution)
      assigned.unpersist()
      joined
    } else {
      val out = joined.localCheckpoint()
      assigned.unpersist()
      out
    }
  }

  /** Incremental semantic near-dup: batch vectors against a standing
    * corpus, within shared clusters only — the embedding-space mirror
    * of [[Dedup.minhashCrossNearDups]]. Both sides are assigned to the
    * SAME seed model (clusters must be stable across a corpus's
    * lifetime, like LSH band config), and the corpus never self-pairs:
    * candidate volume is O(batch x cluster density) regardless of how
    * large the corpus has grown. Returns (batch_id, corpus_id, cos).
    *
    * At 100 TB the corpus side arrives pre-assigned from stored state
    * (assign once at ingest, persist (id, cluster, qv, nsq)) — the
    * corpus text/embedding is then read zero times per ingest; this
    * entry point re-assigns both sides for the self-contained query
    * form. */
  def crossSemanticPairs(corpus: DataFrame, batch: DataFrame,
                         idCol: String, vecCol: String,
                         k: Int, threshold: Double): DataFrame = {
    val seeds = hashSeeds(corpus, idCol, vecCol, k)
    crossSemanticFromState(
      assignmentTable(corpus, idCol, vecCol, seeds),
      batch, idCol, vecCol, seeds, threshold)
  }

  // ---- Persisted semantic-assignment state --------------------------------
  //
  // The embedding-space mirror of Dedup's signature-table family
  // (Dedup.signatureTable / minhashCrossFromState / minhashCrossStates):
  // assign each document's embedding ONCE, at ingest time, and persist
  // the assignment rows; every later ingest then scores its batch
  // against stored state and the corpus embeddings are read zero times.
  // Without this, a daily semantic ingest at 100 TB re-reads and
  // re-assigns the entire corpus per call — the most expensive possible
  // no-op.

  /** The k-row cluster model: (sid, s_qv, s_nsq). Persist ONCE per
    * corpus lifetime — clusters must be stable across ingests (the
    * seed model is the semantic analog of the LSH band config: change
    * it and every stored assignment is invalidated). */
  def seedTable(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    hashSeeds(corpus, idCol, vecCol, k)

  /** The maintained per-doc state: (id, cluster, qv, nsq) — quantized
    * vector and norm alongside the cluster so the pair stage never
    * touches raw embeddings again. Append each accepted batch's rows
    * (the delta IS the batch's assignment — `old ∪ delta`, the same
    * state arithmetic as [[TrainingPipeline.StateDelta]]). */
  def assignmentTable(df: DataFrame, idCol: String, vecCol: String,
                      seeds: DataFrame): DataFrame =
    assignClusters(df, idCol, vecCol, seeds)

  /** Incremental pairs against stored state: the batch is assigned
    * under the PERSISTED seed model and scored only against corpus
    * state rows in shared clusters. Returns (batch_id, corpus_id, cos)
    * plus — via [[assignmentTable]] on the same seeds — the delta to
    * append if the batch is accepted. */
  def crossSemanticFromState(corpusAssign: DataFrame, batch: DataFrame,
                             idCol: String, vecCol: String,
                             seeds: DataFrame, threshold: Double): DataFrame =
    crossSemanticStates(corpusAssign,
      assignClusters(batch, idCol, vecCol, seeds), threshold)

  /** Both sides as precomputed assignment frames — the shape an
    * incremental pipeline uses when the batch's assignment also feeds
    * its own state append (compute once, persist, pass here). */
  def crossSemanticStates(corpusAssign: DataFrame, batchAssign: DataFrame,
                          threshold: Double): DataFrame =
    scoredPairs(batchAssign, corpusAssign, threshold, selfPairs = false)
      .select(col("id_a").as("batch_id"), col("id_b").as("corpus_id"), col("cos"))

  /** Semantic decontamination: flag TRAIN docs whose embedding is
    * cosine-close to any TEST doc — the embedding-space analog of
    * [[TrainingOps.decontaminate]]'s verbatim n-gram check, catching
    * the leaks paraphrase hides from exact grams (the reason modern
    * eval-hygiene pipelines run both). Split membership is the
    * deterministic id-hash split ([[TrainingOps.assignSplit]], so the
    * flagged set is a pure function of the id set), seeds come from
    * the TRAIN side only (the corpus-owns-the-cluster-model contract
    * of [[crossSemanticPairs]]), and the pair stage is the same
    * cluster-blocked join — candidate volume O(test × cluster
    * density), never train × test. Returns (train_id, test_id, cos)
    * per leak; `train_id`s are the docs to drop or quarantine. */
  def semanticDecontaminate(emb: DataFrame, idCol: String, vecCol: String,
                            k: Int, threshold: Double,
                            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val cols = emb.columns.map(col).toSeq
    val withSplit = TrainingOps.assignSplit(emb, col(idCol), trainPct, valPct)
    val train = withSplit.filter(col("split") === "train").select(cols: _*)
    val test  = withSplit.filter(col("split") === "test").select(cols: _*)
    crossSemanticPairs(train, test, idCol, vecCol, k, threshold)
      .select(col("corpus_id").as("train_id"), col("batch_id").as("test_id"),
        col("cos"))
  }

  /** §2.5/§2.7 — semantic train→test leaks over `embeddings`. */
  def semanticDeconQ(s: SparkSession, d: String): DataFrame =
    semanticDecontaminate(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 8, threshold = 0.3)
      .orderBy(col("train_id"), col("test_id"))

  /** The shared pair stage: within-cluster equi join + quantized
    * cosine at `threshold`, over two assigned frames (id, cluster, qv,
    * nsq). `selfPairs = true` joins a frame against itself with the
    * `id_a < id_b` dedup; false scores every a×b cluster collision
    * (the cross-ingest shape — the sides are disjoint by contract).
    * One implementation so the cosine guard and threshold semantics
    * cannot drift between the within-corpus and cross-corpus paths. */
  private def scoredPairs(a: DataFrame, b: DataFrame, threshold: Double,
                          selfPairs: Boolean): DataFrame = {
    val l = a.select(col("cluster"), col("id").as("id_a"),
      col("qv").as("qv_a"), col("nsq").as("nsq_a"))
    val r = b.select(col("cluster").as("cluster_b"), col("id").as("id_b"),
      col("qv").as("qv_b"), col("nsq").as("nsq_b"))
    val cond = col("cluster") === col("cluster_b") &&
      (if (selfPairs) col("id_a") < col("id_b") else lit(true))
    l.join(r, cond)
      .withColumn("cos", cosineFrom(
        dotQuantized(col("qv_a"), col("qv_b")).cast(DoubleType),
        col("nsq_a").cast(DoubleType), col("nsq_b").cast(DoubleType)))
      .filter(col("cos") >= threshold)
  }

  /** §2.7 — semantic dedup groups over `embeddings`, 8 hash-seeded
    * clusters, cosine >= 0.3 (the q_embed_neardup threshold). */
  def semanticDedupQ(s: SparkSession, d: String): DataFrame =
    semanticGroups(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 8, threshold = 0.3)
      .orderBy(col("vec_id"))

  /** §2.7 — the incremental cut on `embeddings`: every fourth vec_id
    * plays the incoming batch (scale-invariant cut, the vector-table
    * analog of q_cross_neardup's source split). Seeds come from the
    * CORPUS side only — a batch must never move the cluster model. */
  def crossSemanticQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    crossSemanticPairs(
        e.filter(col("vec_id") % 4 =!= 3), e.filter(col("vec_id") % 4 === 3),
        "vec_id", "embedding", k = 8, threshold = 0.3)
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_semantic_dedup" -> (semanticDedupQ _),
    "q_cross_semantic" -> (crossSemanticQ _),
    "q_semantic_decon" -> (semanticDeconQ _),
  )

  /** BIGINT quantized dot (no double cast — the L2 comparison must
    * stay integer-exact). Shared with [[PqIndex]]'s oracles so both
    * engines' replays quantize identically. */
  private[operators] def qdot(a: String, b: String) =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |    i -> CAST(floor(CAST($a[i] AS DOUBLE) * 1000000) AS BIGINT) * CAST(floor(CAST($b[i] AS DOUBLE) * 1000000) AS BIGINT)))""".stripMargin

  /** Shared oracle CTE prefix: seed selection (optionally restricted
    * to a corpus-side filter) + quantized-L2 assignment of EVERY
    * vector — one copy so the two semantic oracles cannot
    * desynchronize. Emits CTEs `ph, seeds, v, sv, asg`. Also reused by
    * [[PqIndex]]'s IVF-PQ oracle — its coarse quantizer IS this
    * assignment, so the two replays cannot drift. */
  private[operators] def assignSql(seedWhere: String): String =
    s"""ph AS (${graft.operators.TrainingOps.polyHashSql("semcl|", "embeddings", "vec_id")}),
       |seeds AS (
       |  SELECT e.vec_id AS sid, e.embedding AS se
       |  FROM embeddings e JOIN ph ON e.vec_id = ph.vec_id
       |  $seedWhere
       |  ORDER BY ph.h, e.vec_id LIMIT 8),
       |v AS (SELECT vec_id, embedding, ${qdot("embedding", "embedding")} AS nsq FROM embeddings),
       |sv AS (SELECT sid, se, ${qdot("se", "se")} AS snsq FROM seeds),
       |asg AS MATERIALIZED (
       |  SELECT vec_id, sid AS cluster, embedding, nsq FROM (
       |    SELECT v.vec_id, sv.sid, v.embedding, v.nsq,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY v.nsq + sv.snsq - 2 * ${qdot("v.embedding", "sv.se")}, sv.sid) AS rn
       |    FROM v CROSS JOIN sv) t
       |  WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_semantic_dedup" ->
      s"""WITH RECURSIVE
         |${assignSql("")},
         |pr AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |      CAST(${qdot("a.embedding", "b.embedding")} AS DOUBLE)
         |        / greatest(sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE)), 1e-9) AS cos
         |    FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id) p
         |  WHERE cos >= 0.3),
         |nodes AS MATERIALIZED (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
         |edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pr UNION SELECT id_b, id_a FROM pr),
         |cc(id, comp) AS (
         |  SELECT id, id AS comp FROM nodes
         |  UNION
         |  SELECT e.b AS id, cc.comp FROM cc JOIN edges e ON cc.id = e.a),
         |lab AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id)
         |SELECT asg.vec_id, asg.cluster, COALESCE(lab.comp, asg.vec_id) AS group_id
         |FROM asg LEFT JOIN lab ON asg.vec_id = lab.id
         |ORDER BY asg.vec_id""".stripMargin,

    // seeds from the corpus side only; assignment is a per-row
    // function of (vector, seeds) so assigning the cut jointly or
    // separately is identical — the cross pair join then replays
    // exactly
    "q_cross_semantic" ->
      s"""WITH
         |${assignSql("WHERE e.vec_id % 4 <> 3")}
         |SELECT batch_id, corpus_id, cos FROM (
         |  SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id,
         |    CAST(${qdot("b.embedding", "c.embedding")} AS DOUBLE)
         |      / greatest(sqrt(CAST(b.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)), 1e-9) AS cos
         |  FROM (SELECT * FROM asg WHERE vec_id % 4 = 3) b
         |  JOIN (SELECT * FROM asg WHERE vec_id % 4 <> 3) c ON b.cluster = c.cluster) p
         |WHERE cos >= 0.3
         |ORDER BY batch_id, corpus_id""".stripMargin,

    // split replay (row 73's HUGEINT hash) + seeds restricted to the
    // train side + the same cluster-blocked pair join, train vs test
    "q_semantic_decon" ->
      s"""WITH spl AS (
         |  SELECT vec_id, (h % 100 + 100) % 100 AS bucket
         |  FROM (${graft.operators.TrainingOps.polyHashSql("split|", "embeddings", "vec_id")}) _h),
         |${assignSql("WHERE e.vec_id IN (SELECT vec_id FROM spl WHERE bucket < 80)")}
         |SELECT train_id, test_id, cos FROM (
         |  SELECT c.vec_id AS train_id, b.vec_id AS test_id,
         |    CAST(${qdot("b.embedding", "c.embedding")} AS DOUBLE)
         |      / greatest(sqrt(CAST(b.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)), 1e-9) AS cos
         |  FROM (SELECT a.* FROM asg a JOIN spl USING (vec_id) WHERE spl.bucket >= 90) b
         |  JOIN (SELECT a.* FROM asg a JOIN spl USING (vec_id) WHERE spl.bucket < 80) c
         |    ON b.cluster = c.cluster) p
         |WHERE cos >= 0.3
         |ORDER BY train_id, test_id""".stripMargin,
  )
}
