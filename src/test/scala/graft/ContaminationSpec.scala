package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Contamination, TrainingOps}
import graft.sources.Tables

/** Bloom-accelerated decontamination + contamination scoring (§2.10). */
class ContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom path is row-identical to the exact decontaminate") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val plain = TrainingOps.decontaminate(docs, "doc_id", "text", minShared = 1)
      .orderBy($"train_id", $"test_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(plain.nonEmpty, "fixture produced no contaminated pairs — test is vacuous")
    // tiny filter (256 bits) forces a REAL false-positive load through
    // the exact join; losslessness must survive it
    for (mBits <- Seq(256, 1 << 20)) {
      val bloom = Contamination.decontaminateBloom(docs, "doc_id", "text",
          minShared = 1, mBits = mBits, k = 3)
        .orderBy($"train_id", $"test_id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(bloom == plain, s"bloom path diverged at mBits=$mBits")
    }
  }

  private def hashed(xs: Seq[String]) =
    xs.toDF("s").select(xxhash64($"s").as("h"))

  test("bitset bits are partitioning- and order-invariant") {
    val hashes = hashed((1 to 5000).map(i => s"in-$i"))
    val a = Contamination.bloomOf(hashes, "h", 1 << 14, 3)
      .as[Seq[Long]].head()
    val b = Contamination.bloomOf(
        hashes.repartition(7).sort($"h".desc), "h", 1 << 14, 3)
      .as[Seq[Long]].head()
    assert(a == b)
    assert(a.length == (1 << 14) / 64)
  }

  test("no false negatives; false-positive rate tracks m") {
    val ins = (1 to 1000).map(i => s"in-$i")
    val outs = (1 to 10000).map(i => s"out-$i")
    def fp(mBits: Int): (Long, Long) = {
      val bloom = Contamination.bloomOf(hashed(ins), "h", mBits, 3)
      def hits(xs: Seq[String]) =
        hashed(xs).crossJoin(broadcast(bloom))
          .filter(Contamination.mightContain($"__bits", $"h", mBits, 3))
          .count()
      (hits(ins), hits(outs))
    }
    val (inHits12, outHits12) = fp(1 << 12)
    assert(inHits12 == 1000L, "bloom dropped an inserted hash")
    // loaded filter (3000 probes / 4096 bits): FPs expected but bounded
    assert(outHits12 < 3000L, s"FP rate off the rails: $outHits12/10000")
    val (inHits17, outHits17) = fp(1 << 17)
    assert(inHits17 == 1000L)
    assert(outHits17 < 100L, s"roomy filter should be near-exact: $outHits17/10000")
  }

  test("contamination score: fraction, runs, and clean docs") {
    // pick real split members so the hash-based assignment is honored
    val split = TrainingOps.assignSplit(
        (1L to 400L).toDF("doc_id"), $"doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect()
    val testIds = split.filter(_._2 == "test").map(_._1)
    val trainIds = split.filter(_._2 == "train").map(_._1)
    assert(testIds.length >= 3 && trainIds.length >= 2)
    val Seq(e1, e2, e3) = testIds.take(3).toSeq
    val Seq(t1, t2) = trainIds.take(2).toSeq
    // e1: 10 words -> 3 shingle positions, FIRST 8-gram leaked into t1
    val e1Text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t1Text = "alpha beta gamma delta epsilon zeta eta theta surplus trailer"
    // e2: 9 words -> 2 positions, both leaked (t2 contains e2 verbatim)
    val e2Text = "one two three four five six seven eight nine"
    val t2Text = s"prelude $e2Text coda"
    // e3: 8 words -> 1 position, clean
    val e3Text = "pristine untouched virgin spotless gleaming polished fresh mint"
    val docs = Seq(
      (e1, e1Text), (e2, e2Text), (e3, e3Text), (t1, t1Text), (t2, t2Text))
      .toDF("doc_id", "text")
    val got = Contamination.contaminationScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(e1) == ((e1, 3L, 1L, 1L, 33L)))
    assert(got(e2) == ((e2, 2L, 2L, 2L, 100L)))
    assert(got(e3) == ((e3, 1L, 0L, 0L, 0L)))
    assert(got.size == 3, s"only test docs belong in the report: ${got.keys}")
  }

  test("contamination score is partitioning-invariant on real docs") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = Contamination.contaminationQ(spark, TestSpark.sf).collect().toSeq
    val b = Contamination.contaminationScore(
        docs.repartition(13), "doc_id", "text")
      .orderBy($"test_id").collect().toSeq
    assert(a == b)
  }

  test("persisted eval index screens batches identically to the direct path") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val split = TrainingOps.assignSplit(
      docs.select($"doc_id", $"text"), $"doc_id")
    val evalDocs = split.filter($"split" === "test").select($"doc_id", $"text")
    val batch = split.filter($"split" === "train").select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("evalidx").toString
    Contamination.writeEvalIndex(evalDocs, "doc_id", "text", dir)
    val fed = Contamination.screenAgainstIndex(spark, batch, "doc_id", "text", dir)
      .orderBy($"train_id", $"eval_id")
      .as[(Long, Long, Long)].collect().toSeq
    val direct = TrainingOps.decontaminate(docs, "doc_id", "text", minShared = 1)
      .orderBy($"train_id", $"test_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(fed.nonEmpty && fed == direct,
      s"index-fed screen diverged: ${fed.size} vs ${direct.size} pairs")
  }

  test("plan: bloom rides a broadcast, not a shuffle") {
    val plan = Contamination.deconBloomQ(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bitset"), "bitset aggregate missing from the plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the 1-row bloom frame must broadcast")
  }
}
