package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Document deduplication family (SURVEY.md §2.3 #34-38).
  *
  * Exact dedup is a hash-groupBy. Near-dup is the standard
  * shingle → MinHash → LSH-band → bucket-join → exact-Jaccard-verify
  * pipeline, plus a 64-bit SimHash variant — all expressed as
  * declarative plans (signatures are per-row higher-order-function
  * expressions with no shuffle; only the band bucket join shuffles, on
  * the band hash). No cartesian products anywhere: candidate
  * generation is equi-join-shaped by construction, which is what makes
  * this run at 100 TB (pairs ~ bucket collisions, not n²).
  */
object Dedup {

  /** §2.3#34 — exact dedup groups: md5 of raw text, keeper = min id. */
  def exactGroups(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("h"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** §2.3#35 — exact dedup on the normalized form. */
  def exactNormalizedGroups(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    exactGroups(df.withColumn("__norm", TextFunctions.normalize(textCol)),
      col("__norm"), idCol)

  // ---- MinHash ----------------------------------------------------------
  // (The signature itself is computed inside minhashNearDups as grouped
  // min-aggregates over exploded shingle hashes — a per-row HOF-lambda
  // variant existed and measured ~10x slower, interpreted; it was
  // removed so no caller lands on the slow path.)

  /** LSH band hashes: signature split into `bands` rows of
    * `numPerm/bands`, each hashed with its band index. */
  def bandHashes(sigCol: Column, numPerm: Int, bands: Int): Column = {
    // bands must tile the signature exactly: a remainder silently drops
    // permutations, and bands > numPerm gives rowsPerBand = 0 — every
    // band hash constant — turning the band join into a full n² cross.
    require(bands >= 1 && bands <= numPerm && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val rowsPerBand = numPerm / bands
    array((0 until bands).map { j =>
      val slice = (0 until rowsPerBand).map(r => element_at(sigCol, j * rowsPerBand + r + 1))
      xxhash64((slice :+ lit(j.toLong)): _*)
    }: _*)
  }

  /** §2.3#36 — MinHash-LSH candidate pairs, verified with exact Jaccard
    * over the distinct shingle sets; keeps pairs with jaccard >= threshold.
    *
    * df must have an id column and a text column. Shuffles: one on the
    * band hash (bucket join), one to join shingle sets back for the
    * verify — both equi-joins.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      numPerm: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5): DataFrame = {
    // Hash each shingle to a long ONCE (exploded codegen'd shingles, one
    // grouped agg computing the signature mins AND the distinct-hash set
    // together); both the signature and the Jaccard verify run on the
    // long sets (collision probability ~2^-64 — immaterial). The banded
    // rows carry the hashed set as payload so the verify needs no second
    // join back to the corpus, and pair-dedup keys on ids only (never
    // shuffles arrays as keys).
    val renamed = df.select(col(idCol).as("id"), col(textCol).as("__text"))
    val hashed = TextFunctions.shingleRows(renamed, Seq(col("id")), col("__text"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val minAggs = (0 until numPerm).map(i => min(hash(col("h"), lit(i))).as(s"__m$i"))
    val sh = hashed.groupBy(col("id"))
      .agg(collect_set(col("h")).as("hs"), minAggs: _*)
      .withColumn("sig", array((0 until numPerm).map(i => col(s"__m$i")): _*))
    val banded = sh
      .withColumn("band", explode(bandHashes(col("sig"), numPerm, bands)))
    val a = banded.select(col("band"), col("id").as("id_a"), col("hs").as("hs_a"))
    val b = banded.select(col("band").as("band_b"), col("id").as("id_b"), col("hs").as("hs_b"))
    a.join(b, col("band") === col("band_b") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- Pair resolution --------------------------------------------------

  /** Resolve near-dup PAIRS into canonical GROUPS: connected components
    * by iterative min-label propagation (each doc's group id = the
    * smallest doc id reachable through the pair graph). This is the
    * step that turns pairwise candidates into "keep one per group" —
    * without it a dup chain A~B~C dedups inconsistently.
    *
    * Scale: one join + one grouped min per iteration, all equi-shaped
    * on the node id; iterations = graph diameter, which for dedup
    * graphs is tiny (dup clusters are near-cliques). Convergence is
    * checked with a bounded LIMIT-1 probe, and labels are
    * local-checkpointed to keep lineage flat across iterations.
    * (GraphFrames' alternating large-star/small-star is the upgrade
    * path for adversarial long-chain graphs.) */
  def connectedComponents(pairs: DataFrame, idACol: String, idBCol: String,
                          maxIter: Int = 20): DataFrame = {
    val p = pairs.select(col(idACol).cast(LongType).as("a"),
      col(idBCol).cast(LongType).as("b"))
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val prop = edges.join(labels, edges("a") === labels("id"))
        .select(edges("b").as("id"), col("comp"))
      val next = labels.union(prop)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.select(col("id"), col("comp").as("old")), "id")
        .filter(col("comp") =!= col("old"))
        .limit(1).count() == 0
      labels = next
      i += 1
    }
    labels
  }

  // ---- SimHash ----------------------------------------------------------

  /** §2.3#38 — 64-bit SimHash of the token multiset: per bit position,
    * sign of the sum of ±1 votes from each token's xxhash64.
    *
    * Computed by explode + ONE native vote-vector aggregate
    * (`SimHashAgg`, a TypedImperativeAggregate over a long[64] buffer)
    * with map-side partial aggregation. Earlier formulations — 64
    * per-row `aggregate()` lambdas (interpreted, ~10x slower) and 64
    * separate SUM(CASE) columns (generated update method so large it
    * fell off the JIT cliff nondeterministically: 2.3s vs 9.8s across
    * rounds with unchanged code) — are both retired. One shuffle on
    * the doc id, 512-byte partial buffers, so it scales with corpus
    * size not token count. */
  def simhashDF(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(TextFunctions.normalize(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    toks.groupBy(col("id"))
      .agg(graft.plans.SimHashAgg.simhash(col("h")).as("sim"))
  }

  /** SimHash near-dup pairs: bucket by 16-bit bands (4 bands → finds all
    * pairs with hamming distance <= 3), verify with bit_count(xor). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = simhashDF(df, idCol, textCol)
    val banded = sh.withColumn("band",
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("j"),
          shiftright(col("sim"), j * 16).bitwiseAND(0xffffL).as("v"))): _*)))
    val a = banded.select(col("band"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band").as("band_b"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, col("band") === col("band_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
