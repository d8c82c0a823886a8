package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MinKByLong
import graft.functions.VectorFunctions._
import graft.plans.PolyHash64
import graft.plans.VectorKernels.dot_long
import graft.sources.Tables

/** Product quantization ANN (SURVEY.md §2 rows 106–107) — the
  * compressed-domain similarity-search scale path (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011). The embedding space is split into `m` orthogonal subspaces;
  * each subvector is replaced by the id of its nearest codebook
  * centroid, so a dim-64 float vector becomes `m` small codes — 32×
  * less to store and scan, which is the difference between "the index
  * fits in cluster memory" and "it does not" at 100 TB. Queries scan
  * codes with asymmetric distance (ADC): per query, a (m × kc) lookup
  * table of exact subspace distances to every centroid; a candidate's
  * distance is then `m` table lookups summed — no float math per
  * candidate.
  *
  * Two codebook paths, mirroring [[SemDedup]]'s two cluster paths:
  *  - `kmeansCodebook` (library scale path): per-subspace Lloyd
  *    k-means on a bounded driver sample ([[IvfIndex.trainCentroids]]
  *    per subspace) — tighter cells, spec-verified.
  *  - [[hashCodebook]] (oracle-parity path): the kc vectors with the
  *    smallest `poly_hash64('pqcb|' || id)` donate their subvectors as
  *    centroids. Donor choice, encoding, and ADC are all quantized-
  *    integer math — the whole index replays exactly in DuckDB.
  *
  * Scale shape (100 TB): the codebook is an (m·kc)-row broadcast;
  * encoding is one broadcast-join scoring pass over the corpus (no
  * shuffle beyond the argmin's map-side-combined aggregation) run ONCE
  * at ingest; the ADC scan streams the m-codes-per-doc table against a
  * broadcast LUT; top-k per query runs on the k-bounded
  * [[MinKByLong]] aggregator, so the shuffle carries ≤ k rows per
  * query per map task — no per-query corpus sort anywhere. Composed
  * with the coarse quantizer in [[ivfPqTopK]] (classic IVF-PQ), each
  * query scans only its `nprobe` probed cells' codes.
  */
object PqIndex {

  private def subArr(qv: Column, m: Int, sub: Int): Column =
    array((0 until m).map(s =>
      struct(lit(s).as("sub"), slice(qv, s * sub + 1, sub).as("qsub"))): _*)

  private def checkDims(dim: Int, m: Int): Int = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    dim / m
  }

  /** Hash-seeded codebook: one row per (sub, code) with the quantized
    * centroid `c_q` and its norm² `c_nsq`. Codes are the donors' rank
    * in replayable-hash order, so the table is a pure function of the
    * id set. kc·m rows — broadcast-sized by construction. */
  def hashCodebook(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int, m: Int, kc: Int): DataFrame = {
    val sub = checkDims(dim, m)
    require(kc > 0, s"kc must be positive, got $kc")
    val h = PolyHash64.poly_hash64(concat(lit("pqcb|"), col(idCol).cast(StringType)))
    val donors = df
      .select(col(idCol).as("did"), quantize(col(vecCol)).as("dq"), h.as("__h"))
      .orderBy(col("__h"), col("did"))
      .limit(kc)
    // the unpartitioned window runs over the kc-row donor frame only
    val w = Window.orderBy(col("__h"), col("did"))
    donors
      .withColumn("code", (row_number().over(w) - 1).cast(IntegerType))
      .select(col("code"), explode(subArr(col("dq"), m, sub)).as("se"))
      .select(col("se.sub").as("sub"), col("code"), col("se.qsub").as("c_q"))
      .withColumn("c_nsq", dot_long(col("c_q"), col("c_q")))
  }

  /** Library-path codebook: per-subspace Lloyd k-means (bounded driver
    * sample, deterministic seeds — the [[IvfIndex]] posture), then
    * quantized to the same (sub, code, c_q, c_nsq) shape so encode/ADC
    * are codebook-agnostic. The hash sample is collected ONCE and
    * sliced driver-side — the id hash is slice-independent, so m
    * corpus sort-limit passes would select the same rows m times. */
  def kmeansCodebook(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, kc: Int, iters: Int = 2): DataFrame = {
    val sub = checkDims(dim, m)
    val spark = df.sparkSession
    val sample = IvfIndex.hashSample(df, idCol, vecCol, math.max(kc, 4096))
    val rows = (0 until m).flatMap { s =>
      IvfIndex.trainFromSample(sample.map(_.slice(s * sub, (s + 1) * sub)), kc, iters)
        .zipWithIndex.map { case (c, j) => (s, j, c.map(x => math.floor(x * 1e6).toLong)) }
    }
    import spark.implicits._
    rows.toDF("sub", "code", "c_q")
      .withColumn("code", col("code").cast(IntegerType))
      .withColumn("c_nsq", dot_long(col("c_q"), col("c_q")))
  }

  /** Encode the corpus: (id, sub, code) — each subvector's nearest
    * centroid by exact quantized L2, ties to the lowest code. One
    * broadcast join + a map-side-combined argmin; run once at ingest,
    * the stored index is m small ints per document. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    val sub = checkDims(dim, m)
    df.select(col(idCol).cast(LongType).as("id"),
        explode(subArr(quantize(col(vecCol)), m, sub)).as("se"))
      .select(col("id"), col("se.sub").as("sub"), col("se.qsub").as("qsub"))
      .withColumn("s_nsq", dot_long(col("qsub"), col("qsub")))
      .join(broadcast(codebook), "sub")
      .withColumn("__d2",
        col("s_nsq") + col("c_nsq") - lit(2L) * dot_long(col("qsub"), col("c_q")))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("__d2"), col("code"))).as("__m"))
      .select(col("id"), col("sub"), col("__m.code").as("code"))
  }

  /** Storage form: (id, codes array ordered by sub) — the 32×-smaller
    * table a 100 TB deployment persists and scans. */
  def packCodes(codes: DataFrame): DataFrame =
    codes.groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x("code")).as("codes"))

  /** Per-query ADC distance lookup table: (qid, sub, code, d2) — exact
    * quantized L2 from the query's subvector to every centroid.
    * nq·m·kc rows, broadcast-sized while `queries` is. */
  private def adcLut(queries: DataFrame, idCol: String, vecCol: String,
                     codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    val sub = checkDims(dim, m)
    queries.select(col(idCol).cast(LongType).as("qid"),
        explode(subArr(quantize(col(vecCol)), m, sub)).as("se"))
      .select(col("qid"), col("se.sub").as("sub"), col("se.qsub").as("qsub"))
      .withColumn("q_nsq", dot_long(col("qsub"), col("qsub")))
      .join(codebook, "sub")
      .select(col("qid"), col("sub"), col("code"),
        (col("q_nsq") + col("c_nsq")
          - lit(2L) * dot_long(col("qsub"), col("c_q"))).as("d2"))
  }

  /** k-bounded top-k per query over (qid, cid, d2) — [[MinKByLong]],
    * never a per-query window over scored candidates. Shared with
    * [[ScalarQuant]]'s compressed-domain scan. */
  private[operators] def topKByD2(summed: DataFrame, k: Int): DataFrame = {
    val spark = summed.sparkSession
    import spark.implicits._
    val agg = new MinKByLong(k).toColumn
    summed.select(col("qid"), col("adc_d2"), col("cid"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .toDF("qid", "top")
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), col("p._2").as("cid"), col("p._1").as("adc_d2"),
        (col("pos") + 1).cast(LongType).as("rn"))
  }

  /** Full-corpus ADC top-k: every candidate pays m LUT lookups + adds,
    * the compressed-domain exhaustive baseline. */
  def adcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, codebook: DataFrame, dim: Int, m: Int,
              k: Int): DataFrame = {
    val lut = adcLut(queries, idCol, vecCol, codebook, dim, m)
    val summed = codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("qid"), col("id").as("cid"))
      .agg(sum(col("d2")).as("adc_d2"))
    topKByD2(summed, k)
  }

  /** Two-stage retrieval (§2 row 109): ADC shortlists `shortlist`
    * candidates per query from the compressed codes, then ONLY those
    * rows' full vectors are fetched and reranked by exact quantized
    * L2 — the standard lossy-then-exact serving pattern (PQ recall
    * loss is concentrated past the shortlist boundary; the rerank
    * restores exact order inside it). The shortlist id set (nq ×
    * shortlist rows) is broadcast against the corpus scan, so the
    * full-vector fetch is a broadcast-join row filter — the corpus is
    * never shuffled, and full vectors move for shortlist rows only. */
  def adcRerankTopK(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, codebook: DataFrame,
                    dim: Int, m: Int, shortlist: Int, k: Int): DataFrame = {
    require(k <= shortlist, s"k=$k must not exceed shortlist=$shortlist")
    val short = adcTopK(codes, queries, idCol, vecCol, codebook, dim, m, shortlist)
      .select(col("qid"), col("cid"))
    val cv = corpus.select(col(idCol).cast(LongType).as("cid"),
        quantize(col(vecCol)).as("c_qv"))
      .withColumn("c_nsq", dot_long(col("c_qv"), col("c_qv")))
    val qv = queries.select(col(idCol).cast(LongType).as("qid"),
        quantize(col(vecCol)).as("q_qv"))
      .withColumn("q_nsq", dot_long(col("q_qv"), col("q_qv")))
    val summed = cv.join(broadcast(short), "cid")
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("cid"),
        (col("q_nsq") + col("c_nsq")
          - lit(2L) * dot_long(col("q_qv"), col("c_qv"))).as("adc_d2"))
    topKByD2(summed, k).withColumnRenamed("adc_d2", "d2")
  }

  /** IVF-PQ: [[SemDedup.assignClusters]]' hash-seeded coarse quantizer
    * blocks the corpus into cells; each query probes its `nprobe`
    * nearest cells (exact quantized L2 to the seed, the assignment
    * metric) and ADC-scans only those cells' codes — candidate volume
    * `nprobe/kClusters` of the corpus per query, the standard
    * billion-scale serving layout. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, dim: Int, m: Int, kc: Int,
                kClusters: Int, nprobe: Int, k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= kClusters,
      s"nprobe=$nprobe must be in [1, $kClusters]")
    val seeds = SemDedup.hashSeeds(corpus, idCol, vecCol, kClusters)
    val assigned = SemDedup.assignClusters(corpus, idCol, vecCol, seeds)
      .select(col("id").cast(LongType).as("id"), col("cluster"))
    val cb = hashCodebook(corpus, idCol, vecCol, dim, m, kc)
    val codes = encode(corpus, idCol, vecCol, cb, dim, m)
      .join(assigned, "id")
    val qv = queries.select(col(idCol).cast(LongType).as("qid"),
        quantize(col(vecCol)).as("q_qv"))
      .withColumn("q_nsq", dot_long(col("q_qv"), col("q_qv")))
    // the probe window is per-query over kClusters seed rows — bounded
    val wp = Window.partitionBy(col("qid")).orderBy(col("__d2"), col("sid"))
    val probed = qv.crossJoin(broadcast(seeds))
      .withColumn("__d2",
        col("q_nsq") + col("s_nsq") - lit(2L) * dot_long(col("q_qv"), col("s_qv")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("sid").as("cluster"))
    val lut = adcLut(queries, idCol, vecCol, cb, dim, m)
    val summed = codes.join(broadcast(probed), "cluster")
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("id").as("cid"))
      .agg(sum(col("d2")).as("adc_d2"))
    topKByD2(summed, k)
  }

  // ---- registered queries -------------------------------------------------

  private val Dim = 64; private val M = 4; private val Kc = 8

  /** §2 row 106 — ADC top-5 for every 50th vector over `embeddings`,
    * hash-seeded codebook (m=4 × kc=8). */
  def pqTopKQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cb = hashCodebook(e, "vec_id", "embedding", Dim, M, Kc)
    val codes = encode(e, "vec_id", "embedding", cb, Dim, M)
    adcTopK(codes, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        cb, Dim, M, k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  /** §2 row 109 — ADC shortlist of 20, exact rerank to top-5, for
    * every 50th vector. */
  def pqRerankQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cb = hashCodebook(e, "vec_id", "embedding", Dim, M, Kc)
    val codes = encode(e, "vec_id", "embedding", cb, Dim, M)
    adcRerankTopK(codes, e, e.filter(col("vec_id") % 50 === 0), "vec_id",
        "embedding", cb, Dim, M, shortlist = 20, k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  /** §2 row 107 — IVF-PQ top-5, 8 coarse cells / probe 2, for every
    * 50th vector. */
  def ivfPqTopKQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    ivfPqTopK(e, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        Dim, M, Kc, kClusters = 8, nprobe = 2, k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_topk"    -> (pqTopKQ _),
    "q_ivfpq_topk" -> (ivfPqTopKQ _),
    "q_pq_rerank"  -> (pqRerankQ _),
  )

  // ---- DuckDB oracles -----------------------------------------------------

  import SemDedup.qdot

  private def sl(v: String, subExpr: String): String =
    s"list_slice($v, $subExpr*16+1, $subExpr*16+16)"

  /** Shared oracle CTE block: donor choice, codebook, per-subspace
    * encoding, queries, ADC LUT. Emits `pph, don, cb, enc, q, lut`. */
  private def pqSql: String =
    s"""pph AS (${TrainingOps.polyHashSql("pqcb|", "embeddings", "vec_id")}),
       |don AS (
       |  SELECT e.vec_id AS did, e.embedding AS dv,
       |    CAST(ROW_NUMBER() OVER (ORDER BY pph.h, e.vec_id) - 1 AS INT) AS code
       |  FROM embeddings e JOIN pph ON e.vec_id = pph.vec_id
       |  ORDER BY pph.h, e.vec_id LIMIT 8),
       |cb AS MATERIALIZED (
       |  SELECT s.sub, don.code, ${sl("don.dv", "s.sub")} AS cv
       |  FROM don CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS sub) s),
       |enc AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT v.vec_id, cb.sub, cb.code,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, cb.sub ORDER BY
       |        ${qdot(sl("v.embedding", "cb.sub"), sl("v.embedding", "cb.sub"))}
       |        + ${qdot("cb.cv", "cb.cv")}
       |        - 2 * ${qdot(sl("v.embedding", "cb.sub"), "cb.cv")}, cb.code) AS rn
       |    FROM embeddings v CROSS JOIN cb) t
       |  WHERE rn = 1),
       |q AS (SELECT * FROM embeddings WHERE vec_id % 50 = 0),
       |lut AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, cb.sub, cb.code,
       |    ${qdot(sl("q.embedding", "cb.sub"), sl("q.embedding", "cb.sub"))}
       |    + ${qdot("cb.cv", "cb.cv")}
       |    - 2 * ${qdot(sl("q.embedding", "cb.sub"), "cb.cv")} AS d2
       |  FROM q CROSS JOIN cb)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pq_topk" ->
      s"""WITH
         |$pqSql,
         |sc AS (
         |  SELECT lut.qid, enc.vec_id AS cid, CAST(SUM(lut.d2) AS BIGINT) AS adc_d2
         |  FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code
         |  GROUP BY 1, 2)
         |SELECT qid, cid, adc_d2, rn FROM (
         |  SELECT qid, cid, adc_d2,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rn
         |  FROM sc) t
         |WHERE rn <= 5
         |ORDER BY qid, rn""".stripMargin,

    // ADC shortlist (rn <= 20) then exact quantized-L2 rerank over the
    // shortlisted full vectors only
    "q_pq_rerank" ->
      s"""WITH
         |$pqSql,
         |sc AS (
         |  SELECT lut.qid, enc.vec_id AS cid, CAST(SUM(lut.d2) AS BIGINT) AS adc_d2
         |  FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rn
         |    FROM sc) t
         |  WHERE rn <= 20),
         |rer AS (
         |  SELECT short.qid, short.cid,
         |    CAST(${qdot("qe.embedding", "qe.embedding")}
         |      + ${qdot("ce.embedding", "ce.embedding")}
         |      - 2 * ${qdot("qe.embedding", "ce.embedding")} AS BIGINT) AS d2
         |  FROM short
         |  JOIN embeddings qe ON short.qid = qe.vec_id
         |  JOIN embeddings ce ON short.cid = ce.vec_id)
         |SELECT qid, cid, d2, rn FROM (
         |  SELECT qid, cid, d2,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
         |  FROM rer) t
         |WHERE rn <= 5
         |ORDER BY qid, rn""".stripMargin,

    // coarse quantizer = q_semantic_dedup's seed/assignment CTEs
    // verbatim (SemDedup.assignSql), probe = top-nprobe seeds by the
    // SAME integer metric, then the PQ scan restricted to probed cells
    "q_ivfpq_topk" ->
      s"""WITH
         |${SemDedup.assignSql("")},
         |$pqSql,
         |probe AS (
         |  SELECT qid, cluster FROM (
         |    SELECT q.vec_id AS qid, sv.sid AS cluster,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${qdot("q.embedding", "q.embedding")} + sv.snsq
         |        - 2 * ${qdot("q.embedding", "sv.se")}, sv.sid) AS rn
         |    FROM q CROSS JOIN sv) t
         |  WHERE rn <= 2),
         |cand AS (
         |  SELECT probe.qid, enc.vec_id, enc.sub, enc.code
         |  FROM enc
         |  JOIN asg ON enc.vec_id = asg.vec_id
         |  JOIN probe ON asg.cluster = probe.cluster),
         |sc AS (
         |  SELECT cand.qid, cand.vec_id AS cid, CAST(SUM(lut.d2) AS BIGINT) AS adc_d2
         |  FROM cand JOIN lut ON cand.qid = lut.qid
         |    AND cand.sub = lut.sub AND cand.code = lut.code
         |  GROUP BY 1, 2)
         |SELECT qid, cid, adc_d2, rn FROM (
         |  SELECT qid, cid, adc_d2,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rn
         |  FROM sc) t
         |WHERE rn <= 5
         |ORDER BY qid, rn""".stripMargin,
  )
}
