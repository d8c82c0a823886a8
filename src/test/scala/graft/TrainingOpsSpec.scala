package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingOps
import graft.sources.Tables

/** Training-data pipeline operators (§2.5): deterministic splits,
  * decontamination, token-budget packing. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf)

  test("split assignment is deterministic and proportioned ~80/10/10") {
    val a = TrainingOps.splitAssignQ(spark, TestSpark.sf).collect()
    val b = TrainingOps.splitAssignQ(spark, TestSpark.sf).collect()
    assert(a.sameElements(b), "same ids must always get the same split")

    val counts = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    // hash-mod-100 at n=500: expect the pct within a loose binomial band
    assert(math.abs(counts("train") / n - 0.80) < 0.08, s"train=${counts("train")}/$n")
    assert(math.abs(counts.getOrElse("val", 0) / n - 0.10) < 0.06)
    assert(math.abs(counts.getOrElse("test", 0) / n - 0.10) < 0.06)
  }

  test("split membership is a pure function of the id, not of the frame") {
    // the same ids arriving via a different projection/order assign identically
    val viaDocs = TrainingOps.assignSplit(docs.select($"doc_id"), $"doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val viaRange = TrainingOps.assignSplit(
        spark.range(0, 500).toDF("doc_id").orderBy($"doc_id".desc), $"doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    viaRange.keys.filter(viaDocs.contains).foreach { id =>
      assert(viaDocs(id) == viaRange(id), s"id $id split differs across frames")
    }
  }

  test("decontamination flags a planted verbatim train→test leak") {
    // pick one train id and one test id from the real assignment, then
    // plant a shared 8-gram between synthetic docs under those ids
    val splits = TrainingOps.assignSplit(spark.range(0, 1000).toDF("id"), $"id")
      .select($"id", $"split").as[(Long, String)].collect()
    val trainId = splits.collectFirst { case (id, "train") => id }.get
    val testId  = splits.collectFirst { case (id, "test") => id }.get
    val leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    val corpus = Seq(
      (trainId, s"$leak plus unrelated trailing words here"),
      (testId,  s"prefix words then $leak"),
      (splits.collectFirst { case (id, "train") if id != trainId => id }.get,
        "completely different content with no overlap at all whatsoever today")
    ).toDF("doc_id", "text")
    val pairs = TrainingOps.decontaminate(corpus, "doc_id", "text", minShared = 1)
      .select($"train_id", $"test_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((trainId, testId)), s"got $pairs")
  }

  test("global shuffle order is a permutation, partitioning-invariant, bucketed == plain") {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.PolyHash64
    // permutation: positions are exactly 0..n-1
    val out = TrainingOps.globalShuffleOrder(docs, $"doc_id")
      .select($"id", $"pos").as[(Long, Long)].collect()
    assert(out.map(_._2).sorted.toSeq == out.indices.map(_.toLong).toSeq,
      "positions must be exactly 0..n-1")
    // partitioning invariance
    val re = TrainingOps.globalShuffleOrder(
        docs.repartition(7).orderBy($"doc_id".desc), $"doc_id")
      .select($"id", $"pos").as[(Long, Long)].collect()
    assert(out.toMap == re.toMap)
    // bucketed == the plain single-window rank at small bucketBits
    // (multi-doc buckets force the prefix + residual machinery)
    val h = PolyHash64.poly_hash64(concat(lit("order|"), $"doc_id".cast("string")))
    val plain = docs
      .withColumn("pos", row_number().over(Window.orderBy(h, $"doc_id")).cast("long") - 1L)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    for (bits <- 1 to 3) {
      val got = TrainingOps.globalShuffleOrder(docs, $"doc_id", bucketBits = bits)
        .select($"id", $"pos").as[(Long, Long)].collect().toMap
      assert(got == plain, s"bucketBits=$bits")
    }
  }

  test("weighted interleave: per-corpus permutations, weight-proportional prefixes") {
    import org.apache.spark.sql.expressions.Window
    val weights = Map("a" -> 1L, "b" -> 2L, "c" -> 3L)
    val rows = (1L to 600L).map(i => (Seq("a", "b", "c")((i % 3).toInt), i))
    val df = rows.toDF("corpus", "doc_id")
    val out = TrainingOps.interleaveOrder(df, $"corpus", $"doc_id",
        when($"corpus" === "a", 1L).when($"corpus" === "b", 2L).otherwise(3L))
      .select($"corpus", $"doc_id", $"pos", $"slot")
      .as[(String, Long, Long, Long)].collect()
    // pos is a 0..n_c-1 permutation within each corpus
    out.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.map(_._3).sorted.toSeq == rs.indices.map(_.toLong).toSeq, c)
    }
    // reading in (slot, corpus, id) order, every reasonable prefix
    // carries the corpora in ~1:2:3 proportion (WFQ guarantees each
    // corpus is within one doc of its weighted share at any virtual
    // time, so a 120-doc prefix is 20/40/60 ± slack)
    val ordered = out.sortBy(r => (r._4, r._1, r._2))
    for (n <- Seq(60, 120, 300)) {
      val counts = ordered.take(n).groupBy(_._1).map { case (c, rs) => c -> rs.length }
      val wTot = weights.values.sum
      weights.foreach { case (c, w) =>
        val expect = n.toDouble * w / wTot
        assert(math.abs(counts.getOrElse(c, 0) - expect) <= 3,
          s"prefix $n: corpus $c has ${counts.getOrElse(c, 0)}, expected ~$expect")
      }
    }
    // grouped rank equals the plain per-corpus window form
    val h = graft.plans.PolyHash64.poly_hash64(
      concat(lit("ileave|"), $"doc_id".cast("string")))
    val plain = df.withColumn("pos",
        row_number().over(Window.partitionBy($"corpus").orderBy(h, $"doc_id"))
          .cast("long") - 1L)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(out.map(r => r._2 -> r._3).toMap == plain)
  }

  test("ranged packing is bit-identical to the windowed form, including struct groups") {
    val toks = docs.select($"lang", $"source", $"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
    def bins(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    // simple group key
    val w1 = bins(TrainingOps.packBinned(toks, $"lang", $"doc_id", $"n_tokens", 2048L))
    val r1 = bins(TrainingOps.packBinnedRanged(toks, $"lang", $"doc_id", $"n_tokens", 2048L))
    assert(r1 == w1)
    // struct group key (the pipeline's shape) + adversarial input
    // partitioning + few range partitions so groups straddle slices
    val skewed = toks.repartition(3).orderBy($"doc_id".desc)
    val w2 = bins(TrainingOps.packBinned(skewed,
      struct($"lang", $"source"), $"doc_id", $"n_tokens", 500L))
    val r2 = bins(TrainingOps.packBinnedRanged(skewed,
      struct($"lang", $"source"), $"doc_id", $"n_tokens", 500L, partitions = 2))
    assert(r2 == w2)
  }

  test("greedy packing never overflows capacity (oversized docs excepted)") {
    val toks = docs.select($"lang", $"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
    val cap = 2048L
    val packed = TrainingOps.packGreedy(toks.toDF, "lang", "doc_id", "n_tokens", cap)
    val over = packed.groupBy($"lang", $"bin")
      .agg(sum($"n_tokens").as("t"), count(lit(1)).as("n"))
      .filter($"t" > cap && $"n" > 1)   // a single oversized doc is allowed
      .count()
    assert(over == 0, "a multi-doc bin exceeded capacity")
    // every doc assigned exactly once
    assert(packed.count() == toks.count())
  }

  test("binned packing overflows by at most one document per bin") {
    val toks = docs.select($"lang", $"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
    val cap = 2048L
    val packed = TrainingOps.packBinned(toks.toDF, $"lang", $"doc_id", $"n_tokens", cap)
    // dropping each bin's last (max-id) doc must bring it under capacity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"bin").orderBy($"doc_id".desc)
    val bad = packed.withColumn("rn", row_number().over(w))
      .filter($"rn" > 1)
      .groupBy($"lang", $"bin").agg(sum($"n_tokens").as("t"))
      .filter($"t" > cap)
      .count()
    assert(bad == 0, "a bin exceeds capacity even without its final doc")
  }

  test("greedy packing bins are contiguous and start at 0 per group") {
    val toks = Seq(("en", 1L, 100L), ("en", 2L, 100L), ("en", 3L, 150L),
      ("de", 4L, 300L), ("de", 5L, 10L)).toDF("grp", "id", "n_tokens")
    val packed = TrainingOps.packGreedy(toks, "grp", "id", "n_tokens", 200L)
      .select($"grp", $"id", $"bin").as[(String, Long, Long)].collect().toSet
    // de: doc 4 (300 > cap) takes bin 0 alone; doc 5 must open bin 1
    assert(packed == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L),
      ("de", 4L, 0L), ("de", 5L, 1L)))
  }

  test("vocab ids are dense frequency ranks; id sequences replay the text") {
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "bb aa zz"),
      (3L, "aa")).toDF("doc_id", "text")
    val vocab = TrainingOps.buildVocab(docs, $"text", v = 2)
    val v = vocab.select($"token", $"tid").as[(String, Long)].collect().toMap
    // aa ×4, bb ×2, cc/zz ×1 → top-2 = aa(1), bb(2)
    assert(v == Map("aa" -> 1L, "bb" -> 2L))
    val ids = TrainingOps.idize(docs, $"doc_id", $"text", vocab)
      .select($"doc_id", $"ids", $"n_oov").as[(Long, Seq[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ids(1L) == ((Seq(1L, 2L, 1L, 0L), 1L)), ids(1L).toString)
    assert(ids(2L) == ((Seq(2L, 1L, 0L), 1L)))
    assert(ids(3L) == ((Seq(1L), 0L)))
  }

  test("idize is invariant to input partitioning") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val vocab = TrainingOps.buildVocab(docs, $"text", v = 64)
    val a = TrainingOps.idize(docs, $"doc_id", $"text", vocab)
      .orderBy($"doc_id").collect().toSeq
    val b = TrainingOps.idize(docs.repartition(7), $"doc_id", $"text", vocab)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("nested tiers: strict subset ladder, near-target sizes, exhaustive at 1e6") {
    val ids = (1L to 20000L).toDF("id")
    val t = TrainingOps.nestedTiers(ids, $"id", Seq(10000L, 100000L, 1000000L))
      .as[(Long, Long)].collect().toMap
    val tier0 = t.filter(_._2 == 0L).keySet
    val tier01 = t.filter(_._2 <= 1L).keySet
    // the 1e6 ladder top admits everything: no -1
    assert(t.values.forall(v => v >= 0L && v <= 2L))
    // sizes near 1% and 10% of 20k
    assert(tier0.size > 100 && tier0.size < 320, s"1% tier: ${tier0.size}")
    assert(tier01.size > 1500 && tier01.size < 2600, s"10% tier: ${tier01.size}")
    // nesting: re-running with ONLY the coarser thresholds keeps
    // exactly the same membership for the surviving tiers
    val t2 = TrainingOps.nestedTiers(ids, $"id", Seq(100000L))
      .as[(Long, Long)].collect().toMap
    assert(t2.filter(_._2 == 0L).keySet == tier01,
      "10% subset must be identical whether or not a 1% tier exists below it")
    // and the 1% tier is a strict subset of the 10% tier
    assert(tier0.subsetOf(tier01) && tier0.size < tier01.size)
  }

  test("nested tiers reject non-increasing or out-of-range ladders") {
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      TrainingOps.nestedTiers(ids, $"id", Seq(5L, 5L))
    }
    intercept[IllegalArgumentException] {
      TrainingOps.nestedTiers(ids, $"id", Seq(0L))
    }
    intercept[IllegalArgumentException] {
      TrainingOps.nestedTiers(ids, $"id", Seq(2000000L))
    }
  }
}
