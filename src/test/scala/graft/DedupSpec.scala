package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Near-dup pipelines vs the exact-Jaccard ground truth (§2.3 #36-38). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact ground truth: all pairs with 3-gram Jaccard >= 0.5 (the
    * planted near-dups sit at ~0.99; everything else is < 0.2). */
  lazy val truePairs: Set[(Long, Long)] =
    TextOps.ngramJaccardQ(spark, TestSpark.sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

  test("ground truth contains planted near-dups") {
    assert(truePairs.nonEmpty)
  }

  test("MinHash-LSH finds every true near-dup pair (no false negatives at j≈0.99)") {
    val found = Dedup.minhashNearDups(Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truePairs.subsetOf(found),
      s"missed: ${truePairs.diff(found)}")
  }

  test("MinHash-LSH verified pairs all exceed the threshold (no false positives)") {
    val bad = Dedup.minhashNearDups(Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .filter($"jaccard" < 0.5).count()
    assert(bad == 0)
  }

  test("bottom-k verify sketch reproduces the exact near-dup decisions at a fraction of the state") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val exact = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // k=16 is a REAL sketch on this corpus (docs average ~54 shingles):
    // true pairs sit at j≈0.99 where the k=16 estimator is ~1, and the
    // background is < 0.2 — the margin that makes small k safe here
    val sketched = Dedup.minhashNearDups(docs, "doc_id", "text", verifyK = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(sketched == exact,
      s"k=16 sketch decisions diverge: only-exact=${exact.diff(sketched)} " +
        s"only-sketch=${sketched.diff(exact)}")

    // the cross (batch x corpus) verify too: sketch state on both sides
    val cut = docs.agg(max($"doc_id")).first().getLong(0) / 2
    def cross(k: Int) = Dedup.minhashCrossNearDups(
        docs.filter($"doc_id" <= cut), docs.filter($"doc_id" > cut),
        "doc_id", "text", verifyK = k)
      .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(cross(16) == cross(0), "cross-ingest decisions diverge under the sketch")

    // the point of the knob: witness-state cells drop to a fraction
    val fullCells = Dedup.signatureTable(docs, "doc_id", "text")
      .agg(sum(size($"hs"))).first().getLong(0)
    val cappedCells = Dedup.signatureTable(docs, "doc_id", "text", verifyK = 16)
      .agg(sum(size($"hs"))).first().getLong(0)
    assert(cappedCells < fullCells / 2,
      s"sketch state not materially smaller: $cappedCells vs $fullCells")
    info(f"witness-state cells at k=16: $cappedCells of $fullCells " +
      f"(${cappedCells.toDouble / fullCells}%.2fx)")
  }

  test("MinHash state is computed once: every consumer reads the cache") {
    // Four consumers (band-join a/b, hs-attach a/b) share the expensive
    // shingle+min-agg subplan; exchange reuse is best-effort, so the
    // operator persists the state and this pin proves the wiring: all
    // scans of it in the final plan must be InMemoryTableScan.
    val df = Dedup.minhashNearDups(Tables.documents(spark, TestSpark.sf), "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val cached = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(cached >= 4, s"expected >=4 InMemoryTableScan consumers, saw $cached:\n$plan")
  }

  test("exact dedup groups cover the corpus") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val groups = Dedup.exactGroups(docs, $"text", $"doc_id")
    assert(groups.agg(sum($"n_copies")).as[Long].head == docs.count())
  }


  test("salted band join is pair-identical on a skewed corpus and spreads the hot bucket") {
    // Adversarial shard: 120 copies of one document (all band hashes
    // collide -> one hot bucket) plus distinct filler docs.
    val hot = (0L until 120L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again tonight"))
    val cold = (200L until 260L).map(i =>
      (i, s"unique filler document number $i with its own words ${i * 7} and ${i * 13}"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val plain  = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val salted = Dedup.minhashNearDups(docs, "doc_id", "text", salt = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(salted == plain && plain.size >= 120 * 119 / 2)
    // the scale property: the per-row salt splits one join key into ~8,
    // so the largest (band, salt) shuffle bucket shrinks accordingly
    val salts = docs.select(pmod(xxhash64($"doc_id"), lit(8L)).as("s"))
      .groupBy($"s").count().as[(Long, Long)].collect().toMap
    assert(salts.size == 8 && salts.values.max <= 2L * 180 / 8,
      s"hot bucket not spread: $salts")
  }

  test("16x2 banding keeps candidate volume off the all-pairs cliff at background j≈0.1") {
    // Adversarial corpus for single-row bands: EVERY pair overlaps a
    // little. 120 docs sharing a 20-word backbone + 80 unique words
    // each -> every pair sits at j = 18/178 ≈ 0.10, plus one planted
    // true pair at j ≈ 0.94. Round 3 registered 32 bands x 1 row,
    // where P(candidate) = 1-(1-j)^32 ≈ 97% at j=0.1 — candidate
    // generation degenerates to all-pairs and the band join can never
    // survive a 100x corpus. 16 bands x 2 rows puts a j² inside each
    // band: P = 1-(1-j²)^16 ≈ 15%, while a true pair at j ≥ 0.9 is
    // still missed only with probability (1-0.81)^16 ≈ 2.7e-12.
    val backbone = (0 until 20).map(i => s"shared$i").mkString(" ")
    val base = (0L until 120L).map(i =>
      (i, backbone + " " + (0 until 80).map(k => s"u${i}w$k").mkString(" ")))
    val nearDup = Seq(
      (900L, (0 until 100).map(k => s"pair$k").mkString(" ")),
      (901L, (0 until 100).map(k => if (k == 50) "changed" else s"pair$k").mkString(" ")))
    val docs = (base ++ nearDup).toDF("doc_id", "text")
    val allPairs = 122L * 121L / 2L

    val sh = Dedup.minhashState(docs, "doc_id", "text", numPerm = 32)
    val cand16x2 = Dedup.minhashCandidates(sh, 32, bands = 16).count()
    val cand32x1 = Dedup.minhashCandidates(sh, 32, bands = 32).count()
    assert(cand16x2 < allPairs * 3 / 10,
      s"16x2 candidates $cand16x2 vs all pairs $allPairs — off the cliff")
    assert(cand32x1 > allPairs * 8 / 10,
      s"expected 32x1 to demonstrate the all-pairs cliff, got $cand32x1/$allPairs")
    // and the recall side: the planted true pair still comes through
    val found = Dedup.minhashNearDups(docs, "doc_id", "text", bands = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((900L, 901L)))
  }

  test("SimHash flags the planted near-dups as candidates") {
    val found = Dedup.simhashNearDups(Tables.documents(spark, TestSpark.sf),
        "doc_id", "text", maxHamming = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // SimHash is token-multiset-based; expect it to recover most of the
    // high-Jaccard pairs (it is allowed to add candidates of its own).
    // Band recall above hamming 3 is probabilistic (a pair at hamming
    // 4..10 needs one untouched 16-bit band), so the bound is loose —
    // the deterministic guarantee is the next test.
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.7, s"simhash recall $recall, found=${found.size}")
  }

  test("SimHash banding is EXACT at hamming <= 3 (the oracle-backed config)") {
    // Pigeonhole: 3 differing bits cannot touch all 4 16-bit bands, so
    // the banded candidate join finds EVERY pair at hamming <= 3 — the
    // property that lets q_dedup_simhash be equal to the all-pairs
    // hamming join its DuckDB oracle computes.
    val docs = Tables.documents(spark, TestSpark.sf)
    val sims = Dedup.simhashDF(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    val exact = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == exact, s"banded=${banded.size} exact=${exact.size}")
  }

  // ---- containment (§2 row 117) ----

  test("containment catches an excerpt that Jaccard misses") {
    val page = (1 to 400).map(i => s"tok${i}a tok${i}b").mkString(" ")
    val excerpt = (50 to 60).map(i => s"tok${i}a tok${i}b").mkString(" ")
    val others = (1 to 5).map(i => (100L + i, s"noise$i " * 20))
    val docs = (Seq((1L, page), (2L, excerpt)) ++ others).toDF("doc_id", "text")
    val cont = TextOps.containmentPairs(docs, 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(cont.contains((2L, 1L)), s"excerpt not flagged: $cont")
    assert(!cont.contains((1L, 2L)), "containment must be directional")
    // the symmetric Jaccard of the same pair sits far below any
    // near-dup threshold — this is the relation only containment sees
    val j = TextOps.ngramJaccard(docs.withColumn("n_chars", length($"text")))
      .filter(($"doc_a" === 1 && $"doc_b" === 2) || ($"doc_a" === 2 && $"doc_b" === 1))
    assert(j.count() == 0)
  }

  test("prefix×full candidate filter is lossless vs the brute-force join") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(120)
    val got = TextOps.containmentPairs(docs, 0.5)
      .select($"id_a", $"id_b", $"containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: every doc pair, exact shingle-set containment
    val sets = graft.functions.TextFunctions.shingleRows(docs, Seq($"doc_id"), $"text")
      .select($"doc_id", xxhash64($"sh").as("h")).distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      c = sa.intersect(sb).size.toDouble / sa.size if c >= 0.5
    } yield (a, b, c)).toSet
    assert(got == want, s"got=${got.size} want=${want.size}")
  }
}
