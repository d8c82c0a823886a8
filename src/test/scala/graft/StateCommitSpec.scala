package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingPipeline
import graft.sources.StateStore

/** Delta state commits ([[StateStore]]): commit I/O is O(batch) —
  * independent of corpus size — the store round-trips the exact state
  * `runIncremental` maintains in memory (including tombstone
  * application), and compaction consolidates deltas without changing
  * the live state.
  */
class StateCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def filler(tag: String) =
    (1 to 45).map(i => s"$tag$i").mkString(" ")

  private def corpusOf(n: Int) =
    (1 to n).map(i => (i.toLong, "en", filler(s"c${i}w"))).toDF("doc_id", "lang", "text")

  private val batch =
    (1 to 8).map(i => (1000L + i, "en", filler(s"b${i}w"))).toDF("doc_id", "lang", "text")

  /** Total bytes under `root`, recursively (the ShardPruningSpec
    * measurement pattern: file listings, no data read). */
  private def bytes(root: String): Long = {
    val p = new Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) 0L
    else {
      val it = f.listFiles(p, true)
      var sum = 0L
      while (it.hasNext) sum += it.next().getLen
      sum
    }
  }

  private def bootThenIngest(nCorpus: Int): (Long, Long) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_sc_$nCorpus").toString
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpusOf(nCorpus)), root)
    val bootBytes = bytes(root)
    val delta = TrainingPipeline.runIncremental(
      StateStore.load(spark, root).get, batch)
    StateStore.commitDelta(spark, delta, root)
    (bootBytes, bytes(root) - bootBytes)
  }

  test("second ingest's commit bytes are independent of corpus size") {
    val (boot1, delta1) = bootThenIngest(24)
    val (boot8, delta8) = bootThenIngest(192) // 8x the corpus
    assert(boot8 > 4L * boot1,
      s"sanity: bootstrap commits must scale with the corpus ($boot1 -> $boot8)")
    assert(delta8 < (delta1 * 3) / 2,
      s"delta-commit bytes grew with the corpus: $delta1 at 24 docs vs $delta8 at 192 " +
        "— the commit is rewriting corpus-sized state")
  }

  test("store round-trip equals the in-memory state, tombstones applied") {
    // the IncrementalPipelineSpec bridge scenario, through the store
    val core = (1 to 30).map(i => s"core$i").mkString(" ")
    def suffixed(tag: String) =
      core + " " + (1 to 15).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, "en", suffixed("alpha")),
      (2L, "en", suffixed("beta")),
      (3L, "en", filler("pad"))).toDF("doc_id", "lang", "text")
    val bridge = Seq((10L, "en", core)).toDF("doc_id", "lang", "text")

    val root = java.nio.file.Files.createTempDirectory("graft_sc_rt").toString
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpus), root)
    val delta = TrainingPipeline.runIncremental(StateStore.load(spark, root).get, bridge)
    assert(delta.tombstones.as[(Long, String)].collect().toMap == Map(2L -> "superseded"))
    val v = StateStore.commitDelta(spark, delta, root)

    val loaded = StateStore.loadVersion(spark, root, v)
    def rows(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    assert(rows(loaded.manifest, "doc_id", "split", "lang", "bin", "n_tokens") ==
      rows(delta.state.manifest, "doc_id", "split", "lang", "bin", "n_tokens"))
    assert(rows(loaded.hashes, "h") == rows(delta.state.hashes, "h"))
    assert(rows(loaded.shingles, "doc_id", "split", "h") ==
      rows(delta.state.shingles, "doc_id", "split", "h"))
    assert(rows(loaded.labels, "id", "comp") == rows(delta.state.labels, "id", "comp"))
    assert(loaded.sigs.count() == delta.state.sigs.count())
    // the superseded doc is dead in the store-backed views too
    assert(loaded.manifest.filter($"doc_id" === 2L).count() == 0)
    assert(loaded.shingles.filter($"doc_id" === 2L).count() == 0)
    // time travel: v0 still has it
    assert(StateStore.loadVersion(spark, root, 0L).manifest
      .filter($"doc_id" === 2L).count() == 1)
  }

  test("compact consolidates delta partitions and preserves the live state") {
    val root = java.nio.file.Files.createTempDirectory("graft_sc_cp").toString
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpusOf(6)), root)
    var st = StateStore.load(spark, root).get
    Seq(2000L, 3000L).foreach { base =>
      val b = (1 to 3).map(i => (base + i, "en", filler(s"x${base}_$i")))
        .toDF("doc_id", "lang", "text")
      val d = TrainingPipeline.runIncremental(st, b)
      StateStore.commitDelta(spark, d, root)
      st = d.state
    }
    val before = st.manifest.select($"doc_id").as[Long].collect().sorted.toSeq

    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def deltaParts = f.listStatus(new Path(s"$root/hashes"))
      .count(_.getPath.getName.startsWith("ingest="))
    assert(deltaParts == 3, s"expected 3 delta partitions, saw $deltaParts")

    assert(StateStore.maybeCompact(spark, root, maxDeltas = 16).isEmpty,
      "no compaction below the debt threshold")
    assert(StateStore.maybeCompact(spark, root, maxDeltas = 2).isDefined)
    assert(deltaParts == 1, "compaction must consolidate the delta partitions")
    val after = StateStore.load(spark, root).get.manifest
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(after == before, "compaction changed the live manifest")
    // versions keep counting past a compaction
    val d = TrainingPipeline.runIncremental(StateStore.load(spark, root).get,
      Seq((4001L, "en", filler("post"))).toDF("doc_id", "lang", "text"))
    assert(StateStore.commitDelta(spark, d, root) == 3L)
  }

  test("a compact() crash mid-swap heals on the READ path, never an empty table") {
    val root = java.nio.file.Files.createTempDirectory("graft_sc_heal").toString
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpusOf(5)), root)
    val before = StateStore.load(spark, root).get.shingles
      .select($"doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(before.nonEmpty)

    // simulated crash between DirSwap's two renames on the shingles
    // table: staged rewrite complete, root moved aside, process died.
    // Silently reading this as an EMPTY witness table would re-admit
    // every shipped doc on the next ingest — the read path must roll
    // the swap forward instead.
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new Path(root).getFileSystem(conf)
    val t = s"$root/shingles"
    org.apache.hadoop.fs.FileUtil.copy(f, new Path(t), f, new Path(t + "__swap_tmp"),
      false, conf)
    assert(f.rename(new Path(t), new Path(t + "__swap_trash")))
    assert(!f.exists(new Path(t)), "simulated crash: shingles root is gone")

    val healed = StateStore.load(spark, root).get.shingles
      .select($"doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(healed == before, "healed shingle state differs")
    assert(!f.exists(new Path(t + "__swap_tmp")) && !f.exists(new Path(t + "__swap_trash")))

    // a table root that is GONE (no swap artifacts) for a committed
    // version is corruption and must fail loudly, not read as empty
    assert(f.delete(new Path(s"$root/manifest"), true))
    val e = intercept[Exception] { StateStore.load(spark, root).get.manifest.count() }
    assert(e.getMessage.contains("damaged state root"), e.getMessage)
  }

  test("a crash during the FIRST commit is replayable, lost markers stay loud") {
    val root = java.nio.file.Files.createTempDirectory("graft_sc_first").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new Path(root).getFileSystem(conf)

    // simulated first-commit crash: the .init sentinel and some
    // artifacts landed, no marker yet — load() must see an untouched
    // corpus so the at-least-once replay can run, NOT brick the root
    // forever
    f.mkdirs(new Path(s"$root/commits"))
    f.create(new Path(s"$root/commits/.init"), true).close()
    corpusOf(3).write.parquet(s"$root/hashes/ingest=0")
    assert(StateStore.load(spark, root).isEmpty)
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpusOf(3)), root)
    assert(StateStore.load(spark, root).isDefined)
    // the sentinel may not outlive the commit it guarded — its
    // survival would make the lost-marker damage below read as empty
    assert(!f.exists(new Path(s"$root/commits/.init")),
      ".init sentinel must be deleted once the version marker lands")

    // lost markers on a REAL corpus (commits dir itself gone) remain
    // loud corruption
    val root2 = java.nio.file.Files.createTempDirectory("graft_sc_lost").toString
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpusOf(3)), root2)
    val f2 = new Path(root2).getFileSystem(conf)
    assert(f2.delete(new Path(s"$root2/commits"), true))
    assert(f2.delete(new Path(s"$root2/LATEST"), false))
    val e = intercept[Exception] { StateStore.load(spark, root2) }
    assert(e.getMessage.contains("no commit marker"), e.getMessage)

    // the likeliest partial-damage shape: marker FILES (and LATEST)
    // lost while the commits/ directory itself survives — must stay
    // loud too, not read as an empty corpus (the sentinel, not the
    // directory, is what licenses the replay)
    val root3 = java.nio.file.Files.createTempDirectory("graft_sc_lostm").toString
    StateStore.commitBootstrap(spark, TrainingPipeline.bootstrapState(corpusOf(3)), root3)
    val f3 = new Path(root3).getFileSystem(conf)
    f3.listStatus(new Path(s"$root3/commits")).foreach(s => f3.delete(s.getPath, false))
    assert(f3.exists(new Path(s"$root3/commits")), "commits dir must survive")
    assert(f3.delete(new Path(s"$root3/LATEST"), false))
    val e3 = intercept[Exception] { StateStore.load(spark, root3) }
    assert(e3.getMessage.contains("no commit marker"), e3.getMessage)
  }
}
