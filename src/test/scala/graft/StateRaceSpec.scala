package graft

import org.apache.hadoop.fs.{FileUtil, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingPipeline
import graft.sources.{ShardStore, StateStore}

/** Optimistic-concurrency commits (the rows-90/93 Delta-story close):
  * a lost claim means RECOMPUTE against the winner's state — never a
  * lost update; version numbers commit exactly once; a crash between
  * claim and pointer flip is healed forward by the next reader; the
  * protocol holds over the non-file `graftfs:` scheme; ShardStore's
  * compaction claim fences concurrent compactors. */
class StateRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def filler(tag: String) = (1 to 45).map(i => s"$tag$i").mkString(" ")
  private def corpusOf(n: Int) =
    (1 to n).map(i => (i.toLong, "en", filler(s"c${i}w"))).toDF("doc_id", "lang", "text")
  private def batchOf(base: Long, tag: String) =
    (1 to 3).map(i => (base + i, "en", filler(s"$tag${i}w"))).toDF("doc_id", "lang", "text")

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestIds(root: String): Set[Long] = {
    import spark.implicits._
    StateStore.load(spark, root).get.manifest
      .select($"doc_id").as[Long].collect().toSet
  }

  test("two interleaved writers: the loser recomputes, no update is lost") {
    val root = java.nio.file.Files.createTempDirectory("graft_race").toString
    StateStore.commitBootstrap(spark,
      TrainingPipeline.bootstrapState(corpusOf(4)), root)
    val batchA = batchOf(2000L, "aa")
    val batchB = batchOf(3000L, "bb")

    var aCalls = 0
    val vA = StateStore.commitDeltaOptimistic(spark, root) { st =>
      aCalls += 1
      if (aCalls == 1) {
        // writer B lands a full commit BETWEEN A's state read and A's
        // claim — the classic lost-update interleaving
        val vB = StateStore.commitDeltaOptimistic(spark, root) { stB =>
          TrainingPipeline.runIncremental(stB.get, batchB)
        }
        assert(vB == 1L)
      }
      TrainingPipeline.runIncremental(st.get, batchA)
    }
    assert(vA == 2L)      // A lost v1 to B and committed v2
    assert(aCalls == 2)   // A recomputed against B's state
    val ids = manifestIds(root)
    assert(Set(2001L, 2002L, 2003L).subsetOf(ids), s"A's docs lost: $ids")
    assert(Set(3001L, 3002L, 3003L).subsetOf(ids), s"B's docs lost: $ids")
    assert(StateStore.latestVersion(spark, root).contains(2L))
  }

  test("a perpetually losing writer fails loudly after maxAttempts") {
    val root = java.nio.file.Files.createTempDirectory("graft_race2").toString
    StateStore.commitBootstrap(spark,
      TrainingPipeline.bootstrapState(corpusOf(3)), root)
    var n = 0L
    intercept[java.util.ConcurrentModificationException] {
      StateStore.commitDeltaOptimistic(spark, root, maxAttempts = 2) { st =>
        n += 1
        StateStore.commitDeltaOptimistic(spark, root) { inner =>
          TrainingPipeline.runIncremental(inner.get, batchOf(5000L + n * 10, s"x$n"))
        }
        TrainingPipeline.runIncremental(st.get, batchOf(4000L, "a"))
      }
    }
  }

  test("crash between claim and flip heals forward on the next read") {
    val root = java.nio.file.Files.createTempDirectory("graft_race3").toString
    StateStore.commitBootstrap(spark,
      TrainingPipeline.bootstrapState(corpusOf(3)), root)
    val v1 = StateStore.commitDeltaOptimistic(spark, root) { st =>
      TrainingPipeline.runIncremental(st.get, batchOf(2000L, "aa"))
    }
    assert(v1 == 1L)
    // simulate a writer that CLAIMED v2 with staged artifacts but died
    // before materialize + flip: stage = a copy of v1's artifact dirs,
    // marker carries the token, LATEST still says 1
    val f = fsOf(root)
    val conf = spark.sparkContext.hadoopConfiguration
    val token = "deadbeef-dead-dead-dead-deaddeadbeef"
    Seq("hashes", "sigs", "shingles", "manifest", "dead").foreach { t =>
      FileUtil.copy(f, new Path(s"$root/$t/ingest=1"),
        f, new Path(s"$root/staging/$token/$t"), false, conf)
    }
    FileUtil.copy(f, new Path(s"$root/labels/v=1"),
      f, new Path(s"$root/staging/$token/labels"), false, conf)
    val out = f.create(new Path(s"$root/commits/v2"), false)
    out.write(token.getBytes("UTF-8")); out.close()

    // the next reader heals: LATEST advances to 2, artifacts land
    assert(StateStore.latestVersion(spark, root).contains(2L))
    assert(f.exists(new Path(s"$root/hashes/ingest=2")))
    assert(f.exists(new Path(s"$root/labels/v=2")))
    assert(!f.exists(new Path(s"$root/staging/$token")))
    assert(StateStore.load(spark, root).nonEmpty)
  }

  test("the interleaved-writer protocol holds over graftfs:") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftfs.impl", classOf[GraftFs].getName)
    val root = "graftfs:" +
      java.nio.file.Files.createTempDirectory("graft_race_gfs").toString
    StateStore.commitBootstrap(spark,
      TrainingPipeline.bootstrapState(corpusOf(3)), root)
    var aCalls = 0
    val vA = StateStore.commitDeltaOptimistic(spark, root) { st =>
      aCalls += 1
      if (aCalls == 1)
        StateStore.commitDeltaOptimistic(spark, root) { stB =>
          TrainingPipeline.runIncremental(stB.get, batchOf(3000L, "bb"))
        }
      TrainingPipeline.runIncremental(st.get, batchOf(2000L, "aa"))
    }
    assert(vA == 2L && aCalls == 2)
    val ids = manifestIds(root)
    assert(Set(2001L, 3001L).subsetOf(ids))
  }

  test("shard compaction: a live claim fails loudly, a dead winner's flip heals") {
    val corpus = corpusOf(4)
    val root = java.nio.file.Files.createTempDirectory("graft_race4").toString + "/shards"
    val st0 = TrainingPipeline.bootstrapState(corpus)
    ShardStore.init(corpus, st0.manifest, root)
    val f = fsOf(root)

    // a claim with no completed dir and no advanced pointer = in flight
    f.create(new Path(s"$root/_claim_v1"), false).close()
    intercept[java.util.ConcurrentModificationException] {
      ShardStore.compact(spark, root)
    }
    f.delete(new Path(s"$root/_claim_v1"), false)

    // normal compact proceeds once the claim is gone
    ShardStore.compact(spark, root)
    assert(ShardStore.versions(spark, root).contains(1L))

    // dead winner: v2 fully written (_SUCCESS) + claim, pointer at v1
    val conf = spark.sparkContext.hadoopConfiguration
    FileUtil.copy(f, new Path(s"$root/v1"), f, new Path(s"$root/v2"), false, conf)
    f.create(new Path(s"$root/_claim_v2"), false).close()
    ShardStore.compact(spark, root) // heals the flip instead of throwing
    assert(ShardStore.read(spark, root).count() == corpus.count())
    assert(!f.exists(new Path(s"$root/_claim_v2")))
  }
}
