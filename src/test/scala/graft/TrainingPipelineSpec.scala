package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{CorpusOps, Curation, Dedup, TrainingOps, TrainingPipeline}
import graft.sources.Tables

/** End-to-end corpus→shards pipeline invariants (§2.5 capstone). */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf)
  lazy val cfg = TrainingPipeline.Config()
  lazy val manifest = TrainingPipeline.run(docs, cfg).cache()
  lazy val survivors = manifest.select($"doc_id")

  test("substring-scrub stage: gated off by default, shrinks tokens only when on") {
    // the sf corpus's span-sharing docs are near-dups of each other, so
    // near-dup resolution removes them before the scrub stage ever sees
    // a duplicated gram — plant two gate-passing docs that share one
    // long phrase (5 duplicated 10-grams) but are otherwise disjoint
    // (trigram Jaccard ~0.1, far under the 0.5 near-dup cut) so BOTH
    // reach the scrub and their shared span must be excised
    val filler = (0 until 120)
      .map(i => s"q${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .grouped(60).toSeq
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val planted = Seq(9000001L, 9000002L).zip(filler).map { case (id, ws) =>
      val txt = (ws.take(25) :+ phrase) .mkString(" ") + " " + ws.drop(25).mkString(" ")
      (id, txt, "en", "src99", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.unionByName(planted)

    // the stage sits after near-dup resolution and before the split:
    // the survivor SET and their split/bin grouping keys are untouched
    // (split hashes ids, decon grams stay pre-scrub), only token
    // counts may shrink where corpus-wide duplicated spans were cut
    val on = TrainingPipeline.run(corpus,
        cfg.copy(scrubSpanGram = 10, scrubMinCount = 2))
      .select($"doc_id", $"split", $"lang", $"n_tokens")
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    val off = TrainingPipeline.run(corpus, cfg)
      .select($"doc_id", $"split", $"lang", $"n_tokens")
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(on.keySet == off.keySet,
      "scrub must not change which docs survive, their splits or langs")
    on.foreach { case (id, (_, s, l, t)) =>
      assert(s == off(id)._2 && l == off(id)._3, s"doc $id changed split/lang")
      assert(t <= off(id)._4, s"doc $id gained tokens under scrub")
    }
    // at least one planted doc reaches the manifest (decon can drop at
    // most the train-side one), and every surviving planted doc lost
    // exactly the 14 phrase words
    val survivors = Seq(9000001L, 9000002L).filter(on.contains)
    assert(survivors.nonEmpty, "both planted docs fell out of the manifest")
    survivors.foreach { id =>
      assert(on(id)._4 == off(id)._4 - 14L,
        s"doc $id: expected the shared 14-word span scrubbed, " +
          s"got ${off(id)._4} -> ${on(id)._4}")
    }
  }

  test("id-ization stage: gated off by default, train-only vocab, |ids| == n_tokens") {
    val off = TrainingPipeline.run(docs, cfg)
    assert(!off.columns.contains("ids"),
      "vocabSize = 0 must leave the manifest schema unchanged")
    val on = TrainingPipeline.run(docs, cfg.copy(vocabSize = 64)).cache()
    assert(on.columns.toSeq ==
      Seq("split", "lang", "bin", "doc_id", "n_tokens", "ids", "n_oov"))
    // membership/splits/bins identical to the ungated run
    val offKeys = off.select($"doc_id", $"split", $"bin")
      .as[(Long, String, Long)].collect().toSet
    val onKeys = on.select($"doc_id", $"split", $"bin")
      .as[(Long, String, Long)].collect().toSet
    assert(onKeys == offKeys, "id-ization must not move docs, splits or bins")
    // the sequence length is the packed token count, row for row
    assert(on.filter(size($"ids") =!= $"n_tokens").count() == 0)
    // vocab induced from the train split only: every non-OOV id used
    // anywhere must be a token that occurs in some TRAIN doc
    val trainTokens = on.filter($"split" === "train")
      .join(docs, "doc_id")
      .select(explode(TextFunctions.tokens($"text")).as("t"))
      .distinct().as[String].collect().toSet
    val vocab = TrainingOps.buildVocab(
      on.filter($"split" === "train").join(docs, "doc_id"), $"text", 64)
    val vocabTokens = vocab.select($"token").as[String].collect().toSet
    assert(vocabTokens.subsetOf(trainTokens),
      "vocabulary must come from train-split text only")
    // and n_oov counts exactly the positions mapped to 0
    assert(on.filter($"n_oov" =!= size(filter($"ids", x => x === 0L))).count() == 0)
    on.unpersist()
  }

  test("BPE stage: subword ids when bpeMerges > 0, train-only merges, |ids| == |pieces|") {
    import graft.operators.BpeOps
    val on = TrainingPipeline.run(docs, cfg.copy(vocabSize = 64, bpeMerges = 4)).cache()
    assert(on.columns.toSeq ==
      Seq("split", "lang", "bin", "doc_id", "n_tokens", "ids", "n_oov"))
    // membership/splits/bins identical to the ungated run
    val off = TrainingPipeline.run(docs, cfg)
    assert(on.select($"doc_id", $"split", $"bin").as[(Long, String, Long)].collect().toSet ==
      off.select($"doc_id", $"split", $"bin").as[(Long, String, Long)].collect().toSet)
    // replay the subword path outside the pipeline: merges from the
    // surviving TRAIN docs only, every split encoded through them —
    // |ids| must equal the piece count row for row (NOT n_tokens: the
    // subword sequence is the model's input, n_tokens is corpus mass)
    val trainDocs = docs.join(on.filter($"split" === "train").select($"doc_id"), "doc_id")
    val merges = BpeOps.learnMerges(trainDocs, "text", 4)
    assert(merges.size == 4)
    val pieces = BpeOps.encode(
        docs.join(on.select($"doc_id"), "doc_id"), "doc_id", "text", merges)
      .select($"doc_id", size($"pieces").as("np"))
    assert(on.join(pieces, "doc_id").filter(size($"ids") =!= $"np").count() == 0,
      "|ids| must equal the BPE piece count per doc")
    // OOV bookkeeping holds on the subword path too
    assert(on.filter($"n_oov" =!= size(filter($"ids", x => x === 0L))).count() == 0)
    // subword ids without a vocab stage are a config error
    intercept[IllegalArgumentException] { TrainingPipeline.Config(bpeMerges = 2) }
    on.unpersist()
  }

  test("pipeline is deterministic end-to-end") {
    val a = TrainingPipeline.trainingPipelineQ(spark, TestSpark.sf).collect()
    val b = TrainingPipeline.trainingPipelineQ(spark, TestSpark.sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("every survivor passes the quality and repetition gates") {
    val gated = Curation.score(docs, $"text").filter($"quality" < cfg.minQuality)
      .select($"doc_id")
    assert(survivors.join(gated, Seq("doc_id")).count() == 0)
    val rep = CorpusOps.repetitionStats(docs, "doc_id", "text")
      .filter($"top_frac" > cfg.maxTopFrac || $"dup2_frac" > cfg.maxDup2Frac)
      .select($"doc_id")
    assert(survivors.join(rep, Seq("doc_id")).count() == 0)
  }

  test("no two survivors are exact or near duplicates") {
    val surv = docs.join(survivors, Seq("doc_id"))
    val exactDups = surv
      .groupBy(md5(TextFunctions.normalize($"text"))).count()
      .filter($"count" > 1).count()
    assert(exactDups == 0)
    val nearPairs = Dedup.minhashNearDups(surv, "doc_id", "text",
      threshold = cfg.nearDupThreshold).count()
    assert(nearPairs == 0, "near-dup pairs must have been collapsed to canonicals")
  }

  test("no surviving train doc leaks into the test split") {
    val surv = docs.join(survivors, Seq("doc_id"))
    assert(TrainingOps.decontaminate(surv, "doc_id", "text", minShared = 1).count() == 0)
  }

  test("written shards prune by split/lang and preserve the manifest exactly") {
    val path = java.nio.file.Files.createTempDirectory("graft_shards").toString
    TrainingPipeline.writeShards(docs, manifest, path)
    val back = spark.read.parquet(graft.sources.ShardStore.dataDir(spark, path))
    // partition pruning: the split/lang filters must land in the scan's
    // PartitionFilters (directory-level pruning, no data read elsewhere)
    val trainEn = back.filter($"split" === "train" && $"lang" === "en")
    val p = trainEn.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("(split") && p.contains("(lang"), p)
    assert(trainEn.count() > 0)
    // round-trip: (doc_id, split, lang, bin, n_tokens) survives unchanged, text attached
    val a = back.select($"doc_id", $"split", $"lang", $"bin", $"n_tokens")
      .orderBy($"doc_id").collect()
    val b = manifest.select($"doc_id", $"split", $"lang", $"bin", $"n_tokens")
      .orderBy($"doc_id").collect()
    assert(a.sameElements(b))
    assert(back.filter($"text".isNull).count() == 0)
  }

  test("splits partition the survivors and bins respect the budget") {
    val n = manifest.count()
    assert(manifest.select($"doc_id").distinct().count() == n, "one manifest row per doc")
    val bySplit = manifest.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")) && bySplit("train") > 0)
    val overflow = manifest.groupBy($"split", $"lang", $"bin")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("m"))
      .filter($"t" >= lit(cfg.packCapacity) + $"m").count()
    assert(overflow == 0, "a bin exceeds capacity by more than its largest doc")
  }

  test("decon gram hashes respect the doc-end boundary (no short-gram aliasing)") {
    // The token pass hashes the decon 8-gram at explode time behind a
    // NULL guard on the last lead word. concat_ws SKIPS nulls, so an
    // UNGUARDED hash would alias every doc-end tail shorter than 8
    // words to a "gram" — two docs sharing only a 7-word tail would
    // then spuriously match and decontaminate the train-side doc. Pin
    // both directions: a 7-word shared tail must NOT leak-drop, a
    // genuine shared 8-gram MUST.
    val idProbe = TrainingOps.assignSplit(
        spark.range(9200000L, 9200100L).select($"id".as("doc_id")),
        $"doc_id", cfg.trainPct, cfg.valPct)
      .select($"doc_id", $"split").as[(Long, String)].collect()
    val trainIds = idProbe.filter(_._2 == "train").map(_._1)
    val testIds = idProbe.filter(_._2 == "test").map(_._1)
    // 20 distinct 4-letter prefix words keep the docs through the
    // quality gate (>= 20 tokens, all-alpha) and far below the 0.5
    // near-dup cut (shared trigrams only inside the tail: J <= 0.13)
    def prefixWords(tag: String) = (0 until 20)
      .map(i => s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}")
    val tail7 = "ka kb kc kd ke kf kg"
    val tail8 = "la lb lc ld le lf lg lh"
    def doc(id: Long, tag: String, tail: String) = {
      val txt = (prefixWords(tag) :+ tail).mkString(" ")
      (id, txt, "en", "src99", txt.length.toLong)
    }
    val planted = Seq(
      doc(trainIds(0), "pa", tail7), doc(testIds(0), "pb", tail7),
      doc(trainIds(1), "pc", tail8), doc(testIds(1), "pd", tail8))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val shipped = TrainingPipeline.run(docs.unionByName(planted), cfg)
      .select($"doc_id").as[Long].collect().toSet
    assert(shipped.contains(trainIds(0)),
      "7-word shared tail spuriously decontaminated the train doc (doc-end aliasing)")
    assert(shipped.contains(testIds(0)), "tail-7 test doc fell out of the manifest")
    assert(!shipped.contains(trainIds(1)),
      "a genuinely shared 8-gram must leak-drop the train doc")
    assert(shipped.contains(testIds(1)), "tail-8 test doc fell out of the manifest")
  }
}
