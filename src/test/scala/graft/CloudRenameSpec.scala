package graft

import java.io.IOException
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingPipeline
import graft.sources.{DirSwap, StateStore}

/** An object-store-semantics FileSystem: rename is COPY-THEN-DELETE
  * (file at a time, the S3/GCS reality — no atomic directory rename
  * exists), refusing an existing destination. A crash budget can be
  * armed so the Nth file copy inside a rename throws — the mid-rename
  * crash the commit protocols must survive. Must be top-level with a
  * no-arg ctor (Hadoop reflection). */
class ObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftoss:///")
  override def getScheme: String = "graftoss"

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src) || exists(dst)) false
    else { copyRec(src, dst); delete(src, true); true }
  }

  private def copyRec(src: Path, dst: Path): Unit = {
    if (getFileStatus(src).isDirectory) {
      mkdirs(dst)
      listStatus(src).sortBy(_.getPath.getName).foreach { c =>
        copyRec(c.getPath, new Path(dst, c.getPath.getName))
      }
    } else {
      ObjectStoreFs.maybeCrash()
      val in = open(src)
      val out = create(dst, false)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 1 << 16)
      finally { in.close(); out.close() }
      ObjectStoreFs.copied.incrementAndGet(); ()
    }
  }
}

object ObjectStoreFs {
  // -1 = disarmed; n >= 0 = throw before the (n+1)th file copy
  @volatile var crashAfterFiles: Int = -1
  val copied = new AtomicInteger(0)
  def armCrash(afterFiles: Int): Unit = { copied.set(0); crashAfterFiles = afterFiles }
  def disarm(): Unit = crashAfterFiles = -1
  private[graft] def maybeCrash(): Unit =
    if (crashAfterFiles >= 0 && copied.get() >= crashAfterFiles)
      throw new IOException("simulated crash mid-rename (object-store copy)")
}

/** Commit protocols vs rename-as-copy (SURVEY.md §2 rows 258/93):
  * object stores have no atomic directory rename — a "rename" is a
  * per-file copy then a source delete, so a crash mid-rename leaves
  * BOTH sides present, one partial. These tests prove the healing
  * paths against exactly that:
  *
  *  - [[DirSwap.recover]]'s superset rule: copy-then-delete ordering
  *    means the (relpath, length)-superset side is the complete one —
  *    each crash window is constructed literally and recovery asserted;
  *  - StateStore's materializePending: src-and-dst both present means
  *    the dst is a partial copy (a completed rename deletes its
  *    source) — it is dropped and re-renamed, never skipped;
  *  - the full optimistic-commit lifecycle and the classic interleaved
  *    lost-update run end-to-end over the `graftoss:` scheme, parquet
  *    committer renames included. */
class CloudRenameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def newOssRoot(name: String): String = {
    conf.set("fs.graftoss.impl", classOf[ObjectStoreFs].getName)
    "graftoss:" + java.nio.file.Files.createTempDirectory(name).toString
  }

  private def filler(tag: String) = (1 to 45).map(i => s"$tag$i").mkString(" ")
  private def corpusOf(n: Int) =
    (1 to n).map(i => (i.toLong, "en", filler(s"c${i}w")))
      .toDF("doc_id", "lang", "text")
  private def batchOf(base: Long, tag: String) =
    (1 to 3).map(i => (base + i, "en", filler(s"$tag$i")))
      .toDF("doc_id", "lang", "text")

  // ---- DirSwap superset-rule recovery (crash states built literally) ----

  private def mkFiles(f: FileSystem, dir: Path, files: Map[String, String]): Unit = {
    f.mkdirs(dir)
    files.foreach { case (n, body) =>
      val out = f.create(new Path(dir, n), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
  }
  private def names(f: FileSystem, dir: Path): Set[String] =
    f.listStatus(dir).map(_.getPath.getName).toSet

  private def swapState(rootFiles: Option[Map[String, String]],
                        tmpFiles: Option[Map[String, String]],
                        trashFiles: Option[Map[String, String]]): (FileSystem, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_dirswap").toString
    val root = s"$base/table"
    val f = new Path(root).getFileSystem(conf)
    rootFiles.foreach(m => mkFiles(f, new Path(root), m))
    tmpFiles.foreach(m => mkFiles(f, new Path(DirSwap.tmpDir(root)), m))
    trashFiles.foreach(m => mkFiles(f, new Path(root + "__swap_trash"), m))
    (f, root)
  }

  private val old3 = Map("a" -> "aaa", "b" -> "bb", "c" -> "c")
  private val new2 = Map("x" -> "xxxx", "y" -> "yy")

  test("recover: rename(root->trash) crashed mid-DELETE — trash is complete, restore it") {
    val (f, root) = swapState(
      rootFiles = Some(old3.view.filterKeys(_ == "a").toMap), // partial remains
      tmpFiles = Some(new2), trashFiles = Some(old3))
    DirSwap.recover(f, root)
    assert(names(f, new Path(root)) == Set("a", "b", "c")) // old data intact
    assert(!f.exists(new Path(DirSwap.tmpDir(root))))
    assert(!f.exists(new Path(root + "__swap_trash")))
  }

  test("recover: rename(root->trash) crashed mid-COPY — root is complete, keep it") {
    val (f, root) = swapState(
      rootFiles = Some(old3),
      tmpFiles = Some(new2),
      trashFiles = Some(old3.view.filterKeys(_ == "a").toMap)) // partial copy
    DirSwap.recover(f, root)
    assert(names(f, new Path(root)) == Set("a", "b", "c"))
    assert(!f.exists(new Path(DirSwap.tmpDir(root))))
    assert(!f.exists(new Path(root + "__swap_trash")))
  }

  test("recover: rename(tmp->root) crashed mid-COPY — the swap committed forward, finish it") {
    val (f, root) = swapState(
      rootFiles = Some(new2.view.filterKeys(_ == "x").toMap), // partial new root
      tmpFiles = Some(new2), trashFiles = Some(old3))
    DirSwap.recover(f, root)
    assert(names(f, new Path(root)) == Set("x", "y")) // rewrite promoted
    assert(!f.exists(new Path(DirSwap.tmpDir(root))))
    assert(!f.exists(new Path(root + "__swap_trash")))
  }

  test("recover: normal post-swap trash-delete window — new root kept, trash dropped") {
    val (f, root) = swapState(
      rootFiles = Some(new2), tmpFiles = None, trashFiles = Some(old3))
    DirSwap.recover(f, root)
    assert(names(f, new Path(root)) == Set("x", "y"))
    assert(!f.exists(new Path(root + "__swap_trash")))
  }

  // ---- the protocols end-to-end over copy-rename ----

  test("StateStore bootstrap/delta/load/compact lifecycle over graftoss: (rename-as-copy)") {
    val root = newOssRoot("graft_oss_state") + "/state"
    val v0 = StateStore.commitBootstrap(
      spark, TrainingPipeline.bootstrapState(corpusOf(12)), root)
    val st = StateStore.load(spark, root)
    assert(st.nonEmpty && st.get.manifest.count() == 12)
    val delta = TrainingPipeline.runIncremental(st.get, batchOf(100L, "bw"))
    val v1 = StateStore.commitDelta(spark, delta, root)
    assert(v1 == v0 + 1)
    val vC = StateStore.compact(spark, root) // DirSwap over copy-rename
    assert(vC == v1)
    val live = StateStore.load(spark, root).get.manifest
      .select($"doc_id").as[Long].collect().toSet
    assert(live == ((1 to 12).map(_.toLong) ++ (1 to 3).map(100L + _)).toSet)
  }

  test("interleaved writers over graftoss: — no lost update under copy-rename") {
    val root = newOssRoot("graft_oss_race") + "/state"
    StateStore.commitBootstrap(spark,
      TrainingPipeline.bootstrapState(corpusOf(4)), root)
    var aCalls = 0
    val vA = StateStore.commitDeltaOptimistic(spark, root) { st =>
      aCalls += 1
      if (aCalls == 1) {
        val vB = StateStore.commitDeltaOptimistic(spark, root) { stB =>
          TrainingPipeline.runIncremental(stB.get, batchOf(3000L, "bb"))
        }
        assert(vB == 1L)
      }
      TrainingPipeline.runIncremental(st.get, batchOf(2000L, "aa"))
    }
    assert(vA == 2L && aCalls == 2)
    val ids = StateStore.load(spark, root).get.manifest
      .select($"doc_id").as[Long].collect().toSet
    assert(Set(2001L, 2002L, 2003L).subsetOf(ids))
    assert(Set(3001L, 3002L, 3003L).subsetOf(ids))
  }

  test("a reader crash mid-materialize leaves a partial dst; the next read redoes it") {
    val root = newOssRoot("graft_oss_heal") + "/state"
    StateStore.commitBootstrap(spark,
      TrainingPipeline.bootstrapState(corpusOf(3)), root)
    val v1 = StateStore.commitDeltaOptimistic(spark, root) { st =>
      TrainingPipeline.runIncremental(st.get, batchOf(2000L, "aa"))
    }
    assert(v1 == 1L)
    // a writer CLAIMED v2 with staged artifacts but died before
    // materialize (the StateRaceSpec fixture, over graftoss:)
    val f = new Path(root).getFileSystem(conf)
    val token = "deadbeef-dead-dead-dead-deaddeadbeef"
    Seq("hashes", "sigs", "shingles", "manifest", "dead").foreach { t =>
      FileUtil.copy(f, new Path(s"$root/$t/ingest=1"),
        f, new Path(s"$root/staging/$token/$t"), false, conf)
    }
    FileUtil.copy(f, new Path(s"$root/labels/v=1"),
      f, new Path(s"$root/staging/$token/labels"), false, conf)
    val out = f.create(new Path(s"$root/commits/v2"), false)
    out.write(token.getBytes("UTF-8")); out.close()

    // first healer crashes after ONE file copy: its current table dst
    // is left PARTIAL with the staged src still present
    ObjectStoreFs.armCrash(afterFiles = 1)
    try intercept[Exception] { StateStore.latestVersion(spark, root) }
    finally ObjectStoreFs.disarm()
    assert(f.exists(new Path(s"$root/staging/$token"))) // src survived the crash

    // the next reader detects src-and-dst, drops the partial dst, and
    // completes the commit — the healed state loads whole
    assert(StateStore.latestVersion(spark, root).contains(2L))
    assert(!f.exists(new Path(s"$root/staging/$token")))
    val st = StateStore.load(spark, root)
    assert(st.nonEmpty && st.get.manifest.count() >= 6)
  }
}
