package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps
import graft.sources.Tables

/** Corpus-curation operators (§2.5 continued): repetition rules,
  * token-budget sampling, cross-corpus dedup, label centroids. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf)

  test("repetition rules drop a degenerate doc and keep a diverse one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied sentence where every single word differs completely")
    ).toDF("doc_id", "text")
    val byId = CorpusOps.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(byId(1L)._1 == 1.0, "all-same-word doc: top_frac must be 1")
    assert(byId(1L)._2 > 0.85, "all-same-word doc: bigrams nearly all repeats")
    assert(byId(2L)._1 < 0.12 && byId(2L)._2 == 0.0)
  }

  test("token-budget sample never exceeds budget by more than one doc") {
    val budget = 5000L
    val picked = CorpusOps.tokenBudgetSampleQ(spark, TestSpark.sf)
    val totals = picked.groupBy($"lang")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("m"))
      .select($"lang", $"t", $"m").as[(String, Long, Long)].collect()
    totals.foreach { case (lang, t, m) =>
      assert(t < budget + m, s"$lang: $t tokens exceeds budget+1 doc")
    }
    assert(totals.nonEmpty)
  }

  test("token-budget sample membership survives repartition/reorder") {
    val docs = Tables.documents(spark, TestSpark.sf).select($"lang", $"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      CorpusOps.tokenBudgetSample(df, $"lang", $"doc_id", $"n_tokens", 5000L)
        .select($"doc_id").as[Long].collect().toSet
    assert(ids(docs) == ids(docs.repartition(7).orderBy($"doc_id".desc)))
  }

  test("PPS sample: ~k per group, certainty for oversized docs, partitioning-invariant") {
    val toks = docs.select($"lang", $"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
    def pick(df: org.apache.spark.sql.DataFrame): Set[Long] =
      CorpusOps.ppsSystematicSample(df, $"lang", $"doc_id", $"n_tokens", k = 8)
        .select($"doc_id").as[Long].collect().toSet
    val a = pick(toks)
    assert(pick(toks.repartition(13).orderBy($"doc_id".desc)) == a)
    val perGroup = CorpusOps.ppsSystematicSample(toks, $"lang", $"doc_id", $"n_tokens", 8)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    perGroup.foreach { case (lang, n) => assert(n >= 1 && n <= 8, s"$lang picked $n") }

    // certainty case: one doc holding > W/k weight must always be kept
    val skew = Seq(("g", 1L, 1000L)) ++ (2L to 50L).map(i => ("g", i, 3L))
    val got = CorpusOps.ppsSystematicSample(
      skew.toDF("lang", "doc_id", "n_tokens"), $"lang", $"doc_id", $"n_tokens", 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(got.contains(1L), "a doc heavier than W/k spans a stratum boundary by construction")
  }

  test("budgetPrefixFilter at small bucketBits is row-identical to the plain single window") {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.PolyHash64
    // crafted corpus: 3 groups × 80 docs with zero-token docs mixed in —
    // at bucketBits 1..3 every bucket holds many docs, so the all-in /
    // all-out / boundary classification and the within-bucket residual
    // cumsum (the machinery the sf-scale oracle barely touches at 4096
    // near-singleton buckets) all carry real weight
    val rng = new scala.util.Random(42)
    val rows = (1L to 240L).map { i =>
      ((i % 3).toString, i, if (rng.nextInt(4) == 0) 0L else rng.nextInt(50).toLong)
    }
    val df = rows.toDF("grp", "doc_id", "n_tokens")
    val h = PolyHash64.poly_hash64(concat(lit("sample|"), $"doc_id".cast("string")))
    val w = Window.partitionBy($"grp").orderBy(h, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def plain(budget: Long): Set[Long] =
      df.withColumn("__c", coalesce(sum($"n_tokens").over(w), lit(0L)))
        .filter($"__c" < budget).select($"doc_id").as[Long].collect().toSet

    for (bits <- 1 to 3) {
      // budgets landing EXACTLY on inclusive bucket-prefix masses (the
      // equality case the strict all-in test exists for: a bucket whose
      // inclusive mass == budget must route through the exact cumsum so
      // a zero-token doc at its tail is excluded like the plain form
      // excludes it), plus off-by-one neighbours, tiny, and past-total
      val inclMasses = df
        .withColumn("__b", shiftright(h, 64 - bits))
        .groupBy($"grp", $"__b").agg(sum($"n_tokens").as("bs"))
        .withColumn("incl", sum($"bs").over(
          Window.partitionBy($"grp").orderBy($"__b")))
        .select($"incl").as[Long].collect().toSet
      val budgets =
        (inclMasses.flatMap(m => Seq(m - 1, m, m + 1)) ++ Seq(1L, 7L, 1000000L))
          .filter(_ > 0)
      budgets.foreach { b =>
        val got = CorpusOps.budgetPrefixFilter(
            df, $"grp", $"doc_id", h, $"n_tokens", lit(b), bucketBits = bits)
          .select($"doc_id").as[Long].collect().toSet
        assert(got == plain(b), s"bucketBits=$bits budget=$b")
      }
    }
  }

  test("budgetPrefixFilter rejects negative token counts (bucket-decomposition contract)") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, -3L)).toDF("grp", "doc_id", "n_tokens")
    val ex = intercept[Exception] {
      CorpusOps.budgetPrefixFilter(df, $"grp", $"doc_id",
          graft.plans.PolyHash64.poly_hash64($"doc_id".cast("string")),
          $"n_tokens", lit(100L), bucketBits = 2)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("length-stratified sample: budget-bounded per stratum, partitioning-invariant") {
    val toks = docs.select($"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.lengthStratifiedSample(df, $"doc_id", $"n_tokens",
          strata = 4, totalBudget = 8000L)
        .select($"stratum", $"id", $"n_tokens").as[(Long, Long, Long)].collect()
    val rows = run(toks)
    assert(rows.nonEmpty && rows.map(_._1).distinct.sorted.sameElements(Array(0L, 1L, 2L, 3L)),
      "every stratum must draw something at this budget")
    // prefix semantics: each stratum overshoots its 2000-token share by
    // at most one document
    rows.groupBy(_._1).foreach { case (st, rs) =>
      val t = rs.map(_._3).sum; val m = rs.map(_._3).max
      assert(t < 2000 + m, s"stratum $st drew $t tokens")
    }
    // strata are length-ordered: every doc in a lower stratum is no
    // longer than every doc in a higher one (equal-population rank cut)
    val maxPer = rows.groupBy(_._1).map { case (st, rs) => st -> rs.map(_._3).max }
    val minPer = rows.groupBy(_._1).map { case (st, rs) => st -> rs.map(_._3).min }
    for (st <- 0L to 2L)
      assert(maxPer(st) <= minPer(st + 1),
        s"stratum $st max ${maxPer(st)} exceeds stratum ${st + 1} min ${minPer(st + 1)}")
    assert(run(toks.repartition(9).orderBy($"doc_id".desc)).toSet == rows.toSet)
  }

  test("PPS bucketed engine is row-identical to the plain single-window form") {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.PolyHash64
    val rng = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      ((i % 3).toString, i, rng.nextInt(100).toLong) // zeros included → filtered identically
    }
    val df = rows.toDF("grp", "doc_id", "wt")
    val h = PolyHash64.poly_hash64(concat(lit("pps|"), $"doc_id".cast("string")))
    def plain(k: Int): Set[Long] = {
      val w = Window.partitionBy($"grp").orderBy(h, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      df.filter($"wt" > 0)
        .withColumn("__cb", coalesce(sum($"wt").over(w), lit(0L)))
        .withColumn("__W", sum($"wt").over(Window.partitionBy($"grp")))
        .filter(expr(s"(__cb * $k) div __W < ((__cb + wt) * $k) div __W"))
        .select($"doc_id").as[Long].collect().toSet
    }
    for (bits <- 1 to 3; k <- Seq(1, 3, 8)) {
      val got = CorpusOps.ppsSystematicSample(
          df, $"grp", $"doc_id", $"wt", k, bucketBits = bits)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == plain(k), s"bucketBits=$bits k=$k")
    }
  }

  test("calibrated quality equals the plain per-group percent rank, invariant") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Curation
    val scored = Curation.score(docs, $"text")
      .select($"source", $"doc_id", $"quality")
    def run(df: org.apache.spark.sql.DataFrame, bits: Int) =
      Curation.calibrateQuality(df, $"source", $"quality", $"doc_id", bits)
        .select($"doc_id", $"q_rank").as[(Long, Double)].collect().toMap
    // plain single-window reference: percent rank over the integer
    // score image with id tiebreak
    val w = Window.partitionBy($"source")
      .orderBy(floor($"quality" * 1e9).cast("long"), $"doc_id")
    val plain = scored
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("q_rank", ($"rk" - 1).cast("double") / greatest($"n" - 1, lit(1)))
      .select($"doc_id", $"q_rank").as[(Long, Double)].collect().toMap
    for (bits <- Seq(1, 3, 12))
      assert(run(scored, bits) == plain, s"bucketBits=$bits")
    assert(run(scored.repartition(11).orderBy($"doc_id".desc), 12) == plain)
    assert(plain.values.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("cross dedup flags exactly the batch docs whose text exists in the corpus") {
    val corpus = Seq((1L, "shared   Content here"), (2L, "corpus only text")).toDF("doc_id", "text")
    val batch = Seq((10L, "shared content HERE"),   // normalized-equal to corpus doc 1
                    (11L, "brand new material")).toDF("doc_id", "text")
    val got = CorpusOps.crossDedup(corpus, batch, "doc_id", "text")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(10L -> true, 11L -> false))
  }

  test("cross near-dup finds exactly the true cross-boundary pairs, and only those") {
    import graft.operators.TextOps
    val src = docs.select($"doc_id",
      substring($"source", 4, 10).cast("int").as("sn"))
      .as[(Long, Int)].collect().toMap
    // ground truth: exact 3-gram Jaccard >= 0.5 pairs straddling the cut
    val trueCross = TextOps.ngramJaccardQ(spark, TestSpark.sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (src(a) >= 15) != (src(b) >= 15) }
      .map { case (a, b) => if (src(a) >= 15) (a, b) else (b, a) }.toSet
    assert(trueCross.nonEmpty, "corpus must plant cross-boundary near-dups")

    val got = CorpusOps.crossNearDupQ(spark, TestSpark.sf)
      .select($"batch_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect()
    got.foreach { case (b, c, j) =>
      assert(src(b) >= 15 && src(c) < 15, s"pair ($b,$c) does not straddle the cut")
      assert(j >= 0.5)
    }
    assert(got.map(p => (p._1, p._2)).toSet == trueCross,
      "LSH+verify must find the exact cross ground truth at j~0.99")
  }

  test("a persisted signature table yields identical cross near-dups to the direct path") {
    import graft.operators.Dedup
    val src = docs.withColumn("sn", substring($"source", 4, 10).cast("int"))
    val corpus = src.filter($"sn" < 15).select($"doc_id", $"text")
    val batch = src.filter($"sn" >= 15).select($"doc_id", $"text")

    // "maintained table": state written to parquet once, read back cold
    val dir = java.nio.file.Files.createTempDirectory("graft_sigtable").toString
    Dedup.signatureTable(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val fromTable = Dedup.minhashCrossFromState(spark.read.parquet(dir), batch, "doc_id", "text")
      .select($"batch_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.minhashCrossNearDups(corpus, batch, "doc_id", "text")
      .select($"batch_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(fromTable == direct && fromTable.nonEmpty)
  }

  test("exact centroids are invariant under repartitioning and match AVG closely") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    def exact(df: org.apache.spark.sql.DataFrame): Array[(Int, Int, Double)] =
      CorpusOps.labelCentroids(df, "label", "embedding", exact = true)
        .orderBy($"label", $"pos")
        .select($"label", $"pos", $"centroid").as[(Int, Int, Double)].collect()
    val a = exact(emb.repartition(3))
    val b = exact(emb.repartition(11).orderBy($"vec_id".desc))
    assert(a.sameElements(b), "sorted-fold sum must be partitioning-invariant bit-for-bit")

    val approx = CorpusOps.labelCentroids(emb, "label", "embedding")
      .orderBy($"label", $"pos")
      .select($"label", $"pos", $"centroid").as[(Int, Int, Double)].collect()
    a.zip(approx).foreach { case ((_, _, x), (_, _, y)) =>
      assert(math.abs(x - y) < 1e-9, s"exact $x vs avg $y")
    }
  }
}
