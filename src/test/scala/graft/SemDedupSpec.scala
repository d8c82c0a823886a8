package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemDedup
import graft.sources.Tables

/** Semantic dedup (SemDeDup): cluster-blocked embedding groups. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withDups = {
    val e = Tables.embeddings(spark, TestSpark.sf)
    // clone three vectors under fresh ids: exact duplicates MUST end in
    // the same cluster (identical distances, identical tie-break) and
    // the same group, whichever cluster path runs
    val clones = e.filter($"vec_id".isin(11L, 23L, 35L))
      .withColumn("vec_id", $"vec_id" + 100000L)
    e.unionByName(clones)
  }

  test("exact duplicates group together on both cluster paths") {
    for (refine <- Seq(false, true)) {
      val g = SemDedup.semanticGroups(withDups, "vec_id", "embedding",
          k = 8, threshold = 0.3, refine = refine)
        .select($"vec_id", $"group_id").as[(Long, Long)].collect().toMap
      for (id <- Seq(11L, 23L, 35L))
        assert(g(id) == g(id + 100000L),
          s"refine=$refine: clone of $id not grouped with it")
    }
  }

  test("output is a partition of the input with min-id canonicals") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val out = SemDedup.semanticGroups(e, "vec_id", "embedding", k = 8, threshold = 0.3)
      .select($"vec_id", $"cluster", $"group_id")
      .as[(Long, Long, Long)].collect()
    assert(out.length == e.count())
    assert(out.map(_._1).distinct.length == out.length)
    // canonical is the group min, so group_id <= id and every group id
    // is itself a row whose group_id is itself
    assert(out.forall { case (id, _, gid) => gid <= id })
    val byGroup = out.groupBy(_._3)
    byGroup.foreach { case (gid, members) =>
      assert(members.exists(_._1 == gid), s"group $gid has no canonical row")
    }
    // grouped rows share their canonical's cluster (pairs only form
    // within a cluster)
    byGroup.filter(_._2.length > 1).foreach { case (_, members) =>
      assert(members.map(_._2).distinct.length == 1)
    }
  }

  test("cross pairs: corpus never self-pairs, batch clones are found") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val corpus = e.filter($"vec_id" % 4 =!= 3)
    // plant a batch that contains exact clones of three corpus vectors
    val batch = corpus.filter($"vec_id".isin(0L, 4L, 8L))
      .withColumn("vec_id", $"vec_id" + 200000L + lit(3L)) // keep id % 4 == 3
    val pairs = SemDedup.crossSemanticPairs(corpus, batch,
        "vec_id", "embedding", k = 8, threshold = 0.3)
      .select($"batch_id", $"corpus_id", $"cos").collect()
    // each clone must hit its original with cosine 1 (same cluster by
    // identical distances + deterministic tie-break)
    for (orig <- Seq(0L, 4L, 8L)) {
      val hit = pairs.find(r => r.getLong(0) == orig + 200003L && r.getLong(1) == orig)
      assert(hit.isDefined, s"clone of $orig not paired with it")
      assert(hit.get.getDouble(2) > 0.999)
    }
  }

  test("semantic decontamination flags a planted train→test embedding leak") {
    import graft.operators.TrainingOps
    val e = Tables.embeddings(spark, TestSpark.sf)
    val split = TrainingOps.assignSplit(e.select($"vec_id"), $"vec_id")
      .select($"vec_id", $"split").as[(Long, String)].collect().toMap
    val trainId = split.collectFirst { case (id, "train") => id }.get
    // a fresh id that the deterministic split sends to TEST
    val testId = (800000L to 800200L).find { id =>
      TrainingOps.assignSplit(Seq(id).toDF("vec_id"), $"vec_id")
        .select($"split").as[String].head() == "test"
    }.get
    val planted = e.filter($"vec_id" === trainId).withColumn("vec_id", lit(testId))
    val leaks = graft.operators.SemDedup.semanticDecontaminate(
        e.unionByName(planted), "vec_id", "embedding", k = 8, threshold = 0.3)
      .select($"train_id", $"test_id", $"cos")
      .as[(Long, Long, Double)].collect()
    // the clone must be flagged against its train original with cos ~ 1
    val hit = leaks.find(l => l._1 == trainId && l._2 == testId)
    assert(hit.isDefined, s"planted leak ($trainId -> $testId) not flagged")
    assert(hit.get._3 > 0.999)
    // every flagged pair straddles the split in the right direction
    leaks.foreach { case (tr, te, cos) =>
      assert(split.getOrElse(tr, "train") == "train", s"$tr is not a train doc")
      assert(te == testId || split.getOrElse(te, "test") == "test", s"$te is not a test doc")
      assert(cos >= 0.3)
    }
  }

  test("a persisted assignment table yields identical cross pairs to the direct path") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val corpus = e.filter($"vec_id" % 4 =!= 3)
    val batch = e.filter($"vec_id" % 4 === 3)

    // "maintained tables": seed model + per-doc assignments written to
    // parquet once, read back cold — the ingest then never touches the
    // corpus embeddings (the daily-ingest shape at 100 TB)
    val dir = java.nio.file.Files.createTempDirectory("graft_semstate")
    SemDedup.seedTable(corpus, "vec_id", "embedding", k = 8)
      .write.parquet(s"$dir/seeds")
    val seeds = spark.read.parquet(s"$dir/seeds")
    SemDedup.assignmentTable(corpus, "vec_id", "embedding", seeds)
      .write.parquet(s"$dir/assign")

    val fromTable = SemDedup.crossSemanticFromState(
        spark.read.parquet(s"$dir/assign"), batch, "vec_id", "embedding",
        seeds, threshold = 0.3)
      .select($"batch_id", $"corpus_id", $"cos")
      .as[(Long, Long, Double)].collect().toSet
    val direct = SemDedup.crossSemanticPairs(corpus, batch,
        "vec_id", "embedding", k = 8, threshold = 0.3)
      .select($"batch_id", $"corpus_id", $"cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(fromTable == direct && fromTable.nonEmpty)

    // delta-append arithmetic: state ∪ batch-assignment must equal a
    // from-scratch assignment of the grown corpus under the SAME seeds
    val grownDirect = SemDedup.assignmentTable(
        corpus.unionByName(batch), "vec_id", "embedding", seeds)
      .select($"id", $"cluster").as[(Long, Long)].collect().toSet
    val grownAppended = spark.read.parquet(s"$dir/assign")
      .unionByName(SemDedup.assignmentTable(batch, "vec_id", "embedding", seeds))
      .select($"id", $"cluster").as[(Long, Long)].collect().toSet
    assert(grownAppended == grownDirect)
  }

  test("hash-seeded assignment is partitioning-invariant") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val a = SemDedup.semanticGroups(e, "vec_id", "embedding", k = 8, threshold = 0.3)
      .orderBy($"vec_id").collect().toSeq
    val b = SemDedup.semanticGroups(e.repartition(7), "vec_id", "embedding",
        k = 8, threshold = 0.3)
      .orderBy($"vec_id").collect().toSeq
    assert(a == b)
  }
}
