package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TextFunctions
import graft.plans.BitsetAgg
import graft.sources.Tables

/** Bloom-accelerated decontamination + per-document contamination
  * scoring (SURVEY.md §2.10).
  *
  * The scale problem with exact train↔eval overlap checks (the
  * reference behavior class: set-membership validation of one dataset
  * against another, cf. load.py's existence checks, re-expressed over
  * corpus shingles) is ASYMMETRY: the eval/test side is fixed and small
  * (thousands of docs), the train side is the 100 TB corpus. A plain
  * shingle equi-join shuffles every distinct train shingle — petabytes
  * of hash rows — to probe a set that fits in one broadcast. The fix is
  * the standard semi-join reduction Spark's runtime bloom filters apply
  * to selective joins, made EXPLICIT at the shingle layer where the
  * planner cannot infer it: build a Bloom bitset over the small side's
  * shingle hashes ([[graft.plans.BitsetAgg]] — one constant-size
  * OR-aggregate), broadcast its `mBits/8` bytes, and drop non-candidate
  * train shingles MAP-SIDE, before any distinct/shuffle/join. False
  * positives (~(kn/m)^k, ~2e-5 at the defaults for a 100k-shingle eval
  * set) pass through to the exact equi-join and die there — the
  * pre-filter is LOSSLESS, so the result is bit-identical to the plain
  * path and the DuckDB oracle is the SAME SQL as `q_decontaminate`.
  */
object Contamination {

  // ---- Bloom probe/membership in plain column space ----------------------

  /** Probe i's bit index for hash `h`: `xxhash64(h, i) mod m`. Pure
    * `functions._` composition, shared verbatim by the insert side
    * ([[insertIndices]]) and the membership side ([[mightContain]]) so
    * the two cannot drift. */
  private def probe(h: Column, i: Int, mBits: Int): Column =
    pmod(xxhash64(h, lit(i)), lit(mBits.toLong))

  /** The k bit indices to set for one inserted hash. */
  private[graft] def insertIndices(h: Column, mBits: Int, k: Int): Column =
    array((0 until k).map(probe(h, _, mBits)): _*)

  /** All k probed bits set in the packed bitset? Codegen'd: shifts, AND
    * and `element_at` on the broadcast array — no UDF, no join. */
  private[graft] def mightContain(bits: Column, h: Column, mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val idx = probe(h, i, mBits)
      val word = element_at(bits, (shiftright(idx, 6) + 1).cast(IntegerType))
      call_function("shiftright", word, idx.bitwiseAND(lit(63L)).cast(IntegerType))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** 1-row frame holding the bitset of `hashes`' probe bits. */
  private[graft] def bloomOf(hashes: DataFrame, hCol: String,
                                 mBits: Int, k: Int): DataFrame =
    hashes.select(explode(insertIndices(col(hCol), mBits, k)).as("__idx"))
      .agg(BitsetAgg.bitset(col("__idx"), mBits).as("__bits"))

  // ---- Bloom-accelerated decontamination ---------------------------------

  /** [[TrainingOps.decontaminate]] with the train side pre-filtered by a
    * Bloom bitset of the test side's shingle hashes. Identical output
    * (the exact join removes Bloom false positives; distinct commutes
    * with the filter) — the difference is the SHAPE: the train side's
    * shingle stream is reduced map-side to true candidates + ε before
    * the distinct shuffle, so the exchange carries candidate rows
    * instead of the corpus's whole shingle set. */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minShared: Long = 3,
                         trainPct: Int = 80, valPct: Int = 10,
                         mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val withSplit = TrainingOps.assignSplit(
      docs.select(col(idCol).as("id"), col(textCol).as("__text")),
      col("id"), trainPct, valPct)
    val sh = TextFunctions.shingleRows(withSplit, Seq(col("id"), col("split")),
        col("__text"), n = n)
      .select(col("id"), col("split"), xxhash64(col("sh")).as("h"))
    val test = sh.filter(col("split") === "test")
      .select(col("id").as("test_id"), col("h")).distinct()
    val bloom = bloomOf(test, "h", mBits, k)
    val train = sh.filter(col("split") === "train")
      .select(col("id").as("train_id"), col("h"))
      .join(broadcast(bloom))
      .filter(mightContain(col("__bits"), col("h"), mBits, k))
      .drop("__bits")
      .distinct()
    train.join(test, "h")
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** §2.10 — bloom-path contaminated pairs; oracle IS `q_decontaminate`'s
    * SQL (losslessness is the contract under test). */
  def deconBloomQ(s: SparkSession, d: String): DataFrame =
    decontaminateBloom(Tables.documents(s, d), "doc_id", "text", minShared = 1)
      .orderBy(col("train_id"), col("test_id"))

  // ---- Persisted eval index (incremental decon state) --------------------

  /** Build-once eval index (the [[Dedup.signatureTable]] posture
    * applied to decontamination): the eval set's distinct shingle-hash
    * table — ids kept for pair attribution — plus the Bloom bitset over
    * those hashes and its parameters, all parquet. Eval sets are
    * STATIC while train batches arrive daily; with the index persisted,
    * screening a batch reads ZERO eval text — the bloom is one tiny
    * file and the hash table is ids-only. */
  def writeEvalIndex(evalDocs: DataFrame, idCol: String, textCol: String,
                     dir: String, n: Int = 8,
                     mBits: Int = 1 << 20, k: Int = 3): Unit = {
    val sh = TextFunctions.shingleRows(
        evalDocs.select(col(idCol).as("eval_id"), col(textCol).as("__text")),
        Seq(col("eval_id")), col("__text"), n = n)
      .select(col("eval_id"), xxhash64(col("sh")).as("h"))
      .distinct()
    sh.write.mode("overwrite").parquet(s"$dir/hashes")
    // build the bloom from the hashes just written, not from `sh` —
    // re-evaluating `sh` would run the explode+window shingle pipeline
    // over the eval text a second time
    val written = evalDocs.sparkSession.read.parquet(s"$dir/hashes")
    bloomOf(written.select(col("h")).distinct(), "h", mBits, k)
      .withColumn("m_bits", lit(mBits))
      .withColumn("k_probes", lit(k))
      .withColumn("n_gram", lit(n))
      .write.mode("overwrite").parquet(s"$dir/bloom")
  }

  /** Screen a train batch against a persisted eval index: the batch's
    * shingles are Bloom-prefiltered map-side (parameters come from the
    * index itself, so build and probe cannot disagree), then exactly
    * joined to the hash table. Identical semantics to
    * [[TrainingOps.decontaminate]] restricted to (batch × eval); the
    * 1-row parameter read is the bounded watermark-scalar posture. */
  def screenAgainstIndex(spark: SparkSession, batch: DataFrame,
                         idCol: String, textCol: String, dir: String,
                         minShared: Long = 1): DataFrame = {
    val bloom = spark.read.parquet(s"$dir/bloom")
    // an empty / partially-written index must fail with a message that
    // names the dir, not an opaque NoSuchElementException from head()
    val metaRow = bloom.select(col("m_bits"), col("k_probes"), col("n_gram"))
      .limit(1).collect().headOption
      .getOrElse(throw new IllegalStateException(
        s"eval index at $dir has no bloom parameter row — index empty or partially written"))
    require(!metaRow.anyNull,
      s"eval index at $dir has NULL bloom parameters — index partially written")
    val (mBits, k, n) = (metaRow.getInt(0), metaRow.getInt(1), metaRow.getInt(2))
    val candidates = TextFunctions.shingleRows(
        batch.select(col(idCol).as("train_id"), col(textCol).as("__text")),
        Seq(col("train_id")), col("__text"), n = n)
      .select(col("train_id"), xxhash64(col("sh")).as("h"))
      .join(broadcast(bloom.select(col("__bits"))))
      .filter(mightContain(col("__bits"), col("h"), mBits, k))
      .drop("__bits")
      .distinct()
    candidates.join(spark.read.parquet(s"$dir/hashes"), "h")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---- Per-document contamination scoring --------------------------------

  /** Positional word `n`-gram shingles: one row per (id, pos, hash),
    * pos 1-based over the normalized words, REPEATS KEPT — position
    * coverage, not set membership, is the point here. Same zero-shuffle
    * explode shape as [[TextFunctions.tokenLeadRows]] (codegen array
    * indexing; no token-stream window sort, no HOF lambda). */
  private def positionalShingles(df: DataFrame, idCol: Column, textCol: Column,
                                 n: Int): DataFrame =
    TextFunctions.tokenLeadRows(df, Seq(idCol.as("__id")), textCol, n)
      .filter(col(s"__l${n - 1}").isNotNull)
      .select(col("__id"), (col("__pos") + 1).as("pos"),
        xxhash64(concat_ws(" ",
          (col("__w") +: (1 until n).map(i => col(s"__l$i"))): _*)).as("h"))

  /** Graded contamination (the PaLM/GPT-4-report posture: overlap
    * FRACTION thresholds, not binary hits): for every test doc, the
    * share of its `n`-gram positions whose shingle occurs anywhere in
    * the train split, plus the longest CONSECUTIVE contaminated run —
    * a long verbatim span is a much stronger leak signal than the same
    * mass scattered. Runs via gaps-and-islands (`pos − row_number` is
    * constant within a consecutive block); everything is integer, so
    * the whole query replays in the oracle. Scale shape: the huge train
    * shingle set is Bloom-reduced by the test side's hashes map-side
    * (only hashes the test corpus actually contains can matter to the
    * semi-join), then the membership probe is an ids-only equi-join. */
  def contaminationScore(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, trainPct: Int = 80, valPct: Int = 10,
                         mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val withSplit = TrainingOps.assignSplit(
      docs.select(col(idCol).as("id"), col(textCol).as("__text")),
      col("id"), trainPct, valPct)
    val testSh = positionalShingles(withSplit.filter(col("split") === "test"),
      col("id"), col("__text"), n)
      .withColumnRenamed("__id", "test_id")
    val testHashes = testSh.select(col("h")).distinct()
    val bloom = bloomOf(testHashes, "h", mBits, k)
    val trainSet = TextFunctions.shingleRows(
        withSplit.filter(col("split") === "train"), Seq(col("id")), col("__text"), n = n)
      .select(xxhash64(col("sh")).as("h"))
      .join(broadcast(bloom))
      .filter(mightContain(col("__bits"), col("h"), mBits, k))
      .select(col("h")).distinct()
    val flagged = testSh.join(trainSet, Seq("h"), "left_semi")
    val nSh = testSh.groupBy(col("test_id")).agg(count(lit(1)).as("n_shingles"))
    val nC = flagged.groupBy(col("test_id")).agg(count(lit(1)).as("n_contam"))
    val runs = flagged
      .withColumn("__grp", col("pos") -
        row_number().over(Window.partitionBy(col("test_id")).orderBy(col("pos"))))
      .groupBy(col("test_id"), col("__grp")).agg(count(lit(1)).as("__rl"))
      .groupBy(col("test_id")).agg(max(col("__rl")).as("max_run"))
    nSh.join(nC, Seq("test_id"), "left").join(runs, Seq("test_id"), "left")
      .select(col("test_id"), col("n_shingles"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .withColumn("contam_pct",
        call_function("div", lit(100L) * col("n_contam"), col("n_shingles")))
  }

  /** §2.10 — contamination profile of every test doc with ≥ n words. */
  def contaminationQ(s: SparkSession, d: String): DataFrame =
    contaminationScore(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("test_id"))

  // ---- registration ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decon_bloom"    -> (deconBloomQ _),
    "q_contamination"  -> (contaminationQ _),
  )

  /** Positional shingle prelude (1-based pos, repeats kept) — the
    * DuckDB mirror of [[positionalShingles]]. */
  private val posShingle8Sql =
    """SELECT doc_id, i AS pos,
      |  concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5], ws[i+6], ws[i+7]) AS sh
      |FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-6)) AS i
      |      FROM (SELECT doc_id,
      |              regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
      |            FROM documents) w
      |      WHERE len(ws) >= 8) p""".stripMargin

  val oracles: Map[String, String] = Map(
    // lossless acceleration: the oracle is the exact path's SQL, verbatim
    "q_decon_bloom" -> TrainingOps.oracles("q_decontaminate"),

    "q_contamination" ->
      s"""WITH split AS (${TrainingOps.splitSql}),
         |shp AS ($posShingle8Sql),
         |tr AS (SELECT DISTINCT sh FROM shp JOIN split USING (doc_id)
         |       WHERE split.split = 'train'),
         |te AS (SELECT shp.doc_id AS test_id, pos, sh FROM shp JOIN split USING (doc_id)
         |       WHERE split.split = 'test'),
         |fl AS (SELECT test_id, pos FROM te WHERE sh IN (SELECT sh FROM tr)),
         |runs AS (SELECT test_id, pos,
         |           pos - ROW_NUMBER() OVER (PARTITION BY test_id ORDER BY pos) AS grp
         |         FROM fl),
         |rl AS (SELECT test_id, grp, COUNT(*) AS rl FROM runs GROUP BY 1, 2),
         |agg AS (SELECT test_id, COUNT(*) AS n_shingles FROM te GROUP BY 1),
         |c AS (SELECT test_id, COUNT(*) AS n_contam FROM fl GROUP BY 1),
         |m AS (SELECT test_id, CAST(MAX(rl) AS BIGINT) AS max_run FROM rl GROUP BY 1)
         |SELECT agg.test_id, n_shingles,
         |  COALESCE(c.n_contam, 0) AS n_contam,
         |  COALESCE(m.max_run, 0) AS max_run,
         |  (100 * COALESCE(c.n_contam, 0)) // n_shingles AS contam_pct
         |FROM agg LEFT JOIN c USING (test_id) LEFT JOIN m USING (test_id)
         |ORDER BY test_id""".stripMargin,
  )
}
