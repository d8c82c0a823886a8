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

  /** MinHash signature column: for each "permutation" i, min over
    * shingles of xxhash64(shingle, i) — seeded rehash instead of the
    * classic (a*h+b) linear scheme, because ANSI mode (Spark 4 default)
    * rejects the intentional wraparound multiply. Pure expression —
    * computed rowwise during the scan, no shuffle. */
  def minhashSignature(shinglesCol: Column, numPerm: Int = 32): Column =
    array((0 until numPerm).map { i =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(i))))
    }: _*)

  /** LSH band hashes: signature split into `bands` rows of
    * `numPerm/bands`, each hashed with its band index. */
  def bandHashes(sigCol: Column, numPerm: Int, bands: Int): Column = {
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
    val sh = df.select(col(idCol).as("id"),
        array_distinct(TextFunctions.shingles(col(textCol))).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), numPerm))
      .withColumn("band", explode(bandHashes(col("sig"), numPerm, bands)))
    val a = sig.select(col("band"), col("id").as("id_a"))
    val b = sig.select(col("band").as("band_b"), col("id").as("id_b"))
    val cands = a.join(b, col("band") === col("band_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val withSets = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** §2.3#38 — 64-bit SimHash of the token multiset: per bit position,
    * sign of the sum of ±1 votes from each token's xxhash64. Pure
    * per-row expression over the token array. */
  def simhash(tokensCol: Column): Column = {
    val hashes = transform(tokensCol, t => xxhash64(t))
    val bitSums = (0 until 64).map { bit =>
      aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (s, bit) =>
      when(s > 0, lit(1L << bit)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs: bucket by 16-bit bands (4 bands → finds all
    * pairs with hamming distance <= 3), verify with bit_count(xor). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        simhash(TextFunctions.tokens(TextFunctions.normalize(col(textCol)))).as("sim"))
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
