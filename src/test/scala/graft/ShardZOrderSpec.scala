package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ShardStore

/** Z-ordered shard layout vs the plain (bin, doc_id) sort for a
  * SIZE-BOUNDED bin-range read — the length-bucketed training-reader
  * shape ("bins in [lo, hi], docs under T tokens"). The plain layout
  * prunes on bin only: every file in the bin range opens whatever the
  * token bound. The (bin, n_tokens) z-layout gives each file a small
  * rectangle of that space, so min/max stats cut on both predicates.
  * Skip sets are computed the way a stats-pruning reader computes
  * them (per-file min/max vs the predicate), the ShardPruningSpec
  * measurement pattern. */
class ShardZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z-ordered shard files prune size-bounded bin-range reads on both predicates") {
    // Synthetic manifest at a size where file rectangles are crisp
    // (the composed pipeline at spec SF yields too few rows for a
    // meaningful skip-set measurement — this spec is about the STORE
    // layout; ShardPruningSpec covers the pipeline-fed path). Token
    // lengths are a deterministic hash, uncorrelated with bin — the
    // adversarial case for single-column clustering.
    val n = 8000L
    val manifest = spark.range(n).select(
      lit("train").as("split"), lit("en").as("lang"),
      (col("id") / 16L).cast("long").as("bin"), col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(480L)) + 20L).as("n_tokens"))
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"), lit("en").as("lang"))
    val base = java.nio.file.Files.createTempDirectory("graft_zshard").toString
    val plain = base + "/plain"
    val zed = base + "/zed"

    ShardStore.init(docs, manifest, plain, maxRecordsPerFile = 16L)
    ShardStore.initZOrdered(docs, manifest, zed, maxRecordsPerFile = 16L)

    val bins = n / 16L
    // a quarter of the bin range, docs under the ~25th token
    // percentile — the selective rectangle a length-bucketed reader
    // asks for; the plain layout can only prune the bin dimension
    val (binLo, binHi) = (bins / 4, bins / 2)
    val tokCap = 140L // ~25th percentile of 20 + uniform[0, 480)

    def q(root: String) = spark.read.parquet(ShardStore.dataDir(spark, root))
      .filter($"split" === "train" && $"lang" === "en" &&
        $"bin".between(binLo, binHi) && $"n_tokens" <= tokCap)

    // identical answers from both layouts
    val a = q(plain).select($"doc_id").as[Long].collect().sorted
    val b = q(zed).select($"doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b))

    // both predicates reach the scan (stats pruning needs them there);
    // widen the metadata render so the PushedFilters list isn't cut off
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan = try q(zed).queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(n_tokens") &&
      plan.contains("GreaterThanOrEqual(bin"), plan)

    /** Files whose (bin, n_tokens) min/max rectangle intersects the
      * predicate rectangle — what a stats-pruning reader must open. */
    def filesAdmitting(root: String): (Long, Long) = {
      val perFile = spark.read.parquet(ShardStore.dataDir(spark, root))
        .filter($"split" === "train" && $"lang" === "en")
        .select($"bin", $"n_tokens", input_file_name().as("f"))
        .groupBy($"f").agg(
          min($"bin").as("blo"), max($"bin").as("bhi"),
          min($"n_tokens").as("tlo"), max($"n_tokens").as("thi"))
      (perFile.filter($"blo" <= binHi && $"bhi" >= binLo && $"tlo" <= tokCap).count(),
        perFile.count())
    }
    val (openP, totalP) = filesAdmitting(plain)
    val (openZ, totalZ) = filesAdmitting(zed)
    assert(totalP >= 8 && totalZ >= 8, s"want many files, got $totalP / $totalZ")
    // plain opens (nearly) the whole bin range; z-order cuts it down
    assert(openZ * 2 <= openP,
      s"z-layout must at least halve the opened files: z opens $openZ of $totalZ, " +
        s"plain opens $openP of $totalP")
    info(s"size-bounded bin-range read opens $openZ of $totalZ files z-ordered " +
      s"vs $openP of $totalP plain-sorted")
  }
}
