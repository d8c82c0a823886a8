package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TrainingPipeline.{CorpusState, IngestDelta}

/** Versioned DELTA commits for the incremental-ingest corpus state
  * ([[graft.operators.TrainingPipeline.CorpusState]]) — the layout that
  * makes a daily ingest's state-commit I/O O(batch), not O(corpus).
  *
  * The witness tables (`hashes`, `sigs`, `shingles`, `manifest`) are
  * append-only minus per-doc tombstones, and `runIncremental` already
  * computes each ingest's exact delta — so a commit writes ONLY that
  * delta, as one new `ingest=<v>` partition per table:
  *
  * {{{
  * root/
  *   hashes/ingest=<v>/     (h)                              append-only
  *   sigs/ingest=<v>/       (id, hs, sig)                    append-only
  *   shingles/ingest=<v>/   (doc_id, split, h)               append-only
  *   manifest/ingest=<v>/   (split, lang, bin, doc_id, n_tokens)
  *   dead/ingest=<v>/       (doc_id)   docs tombstoned AT v  append-only
  *   labels/v=<v>/          (id, comp) full per version — CC labels
  *                          MUTATE on merge, so they are not
  *                          append-shaped; they are also the smallest
  *                          table (non-singleton nodes only)
  *   commits/v<v>           empty marker: version v fully written
  *   LATEST                 pointer file, flipped last
  * }}}
  *
  * [[loadVersion]] reconstructs state-at-v by partition-pruned reads
  * (`ingest <= v`) plus ONE anti-join of the accumulated dead set onto
  * shingles and manifest — exactly the logical state `runIncremental`
  * maintains in memory, because doc ids are globally unique and a doc
  * is never re-admitted after a tombstone (both are existing contract).
  * Old versions stay readable (state time travel) until [[compact]]
  * consolidates the accumulated delta partitions.
  *
  * Crash/replay semantics: every per-version artifact write is an
  * OVERWRITE of a directory no committed version references yet, so a
  * replayed commit is idempotent; the `commits/v<v>` marker lands only
  * after every artifact, and LATEST flips last. A lost LATEST is
  * RECOVERED from the markers (max committed v) instead of silently
  * bootstrapping an empty corpus — the failure that would re-admit
  * every previously shipped doc. State artifacts with NO markers fail
  * loudly as corruption.
  */
object StateStore {

  private val Tables = Seq("hashes", "sigs", "shingles", "manifest", "dead")

  private val schemas: Map[String, StructType] = Map(
    "hashes" -> StructType(Seq(StructField("h", StringType))),
    "sigs" -> StructType(Seq(
      StructField("id", LongType),
      StructField("hs", ArrayType(LongType)),
      StructField("sig", ArrayType(IntegerType)))),
    "shingles" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("split", StringType),
      StructField("h", LongType))),
    "manifest" -> StructType(Seq(
      StructField("split", StringType),
      StructField("lang", StringType),
      StructField("bin", LongType),
      StructField("doc_id", LongType),
      StructField("n_tokens", LongType))),
    "dead" -> StructType(Seq(StructField("doc_id", LongType))),
    "labels" -> StructType(Seq(
      StructField("id", LongType),
      StructField("comp", LongType))))

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def latestPath(root: String) = new Path(s"$root/LATEST")
  private def markerPath(root: String, v: Long) = new Path(s"$root/commits/v$v")
  // In-flight-commit sentinel: created BEFORE any artifact, deleted
  // right after the version marker lands — so it can never outlive a
  // real commit. Its presence (with no markers) means "a commit died
  // mid-write, replay is safe"; its absence alongside state artifacts
  // means the markers of a REAL corpus were lost — loud corruption.
  private def initSentinel(root: String) = new Path(s"$root/commits/.init")

  /** Latest committed version — the COMMIT MARKERS are the truth,
    * LATEST is a healed-forward cache. A missing LATEST with markers
    * present is recovered; a STALE LATEST behind a newer marker (an
    * optimistic commit that crashed between claim and pointer flip)
    * is healed forward after materializing that version's staged
    * artifacts; state tables with no markers at all fail loudly —
    * silently treating a damaged root as an empty corpus would
    * re-admit every shipped doc downstream. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    if (f.exists(latestPath(root))) {
      val in = f.open(latestPath(root))
      val l = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      val commitsDir = new Path(s"$root/commits")
      val maxMarker =
        if (!f.exists(commitsDir)) None
        else f.listStatus(commitsDir).toSeq
          .map(_.getPath.getName).filter(_.startsWith("v"))
          .map(_.drop(1).toLong).sorted.lastOption
      maxMarker.filter(_ > l) match {
        case Some(m) => // claimed + marked but the flip crashed: heal forward
          (l + 1L to m).foreach(v => materializePending(spark, root, v))
          writeLatest(spark, root, m)
          Some(m)
        case None => Some(l)
      }
    } else {
      val commitsDir = new Path(s"$root/commits")
      val recovered =
        if (!f.exists(commitsDir)) None
        else f.listStatus(commitsDir).toSeq
          .map(_.getPath.getName).filter(_.startsWith("v"))
          .map(_.drop(1).toLong).sorted.lastOption
      recovered match {
        case Some(v) => // heal the pointer (+ any staged artifacts)
          (0L to v).foreach(x => materializePending(spark, root, x))
          writeLatest(spark, root, v); Some(v)
        case None =>
          // No markers. Distinguish an interrupted commit (the `.init`
          // sentinel lands before any artifact and is deleted only
          // after the marker, so sentinel + artifacts + no marker = a
          // v0 commit that died mid-write — safe to treat as empty:
          // the replayed bootstrap overwrites the same dirs) from true
          // damage (artifacts but NO sentinel = the markers of a real
          // corpus were lost, even if the commits dir itself survived).
          val initSeen = f.exists(initSentinel(root))
          require(initSeen || Tables.forall(t => !f.exists(new Path(s"$root/$t"))),
            s"state tables exist under $root but no commit marker does — " +
              "refusing to treat a damaged state root as an empty corpus")
          None
      }
    }
  }

  private def writeLatest(spark: SparkSession, root: String, v: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/LATEST.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(latestPath(root))) f.delete(latestPath(root), false)
    require(f.rename(tmp, latestPath(root)), s"could not flip $root/LATEST")
  }

  private def writePartition(df: DataFrame, table: String, root: String,
                             v: Long, cols: Seq[String]): Unit =
    df.select(cols.map(col): _*)
      .write.mode("overwrite").parquet(s"$root/$table/ingest=$v")

  private def commitVersion(spark: SparkSession, root: String, v: Long,
                            hashes: DataFrame, sigs: DataFrame,
                            shingles: DataFrame, manifest: DataFrame,
                            dead: DataFrame, labels: DataFrame): Long = {
    val f = fs(spark, root)
    // the `.init` sentinel lands BEFORE any artifact: a crash
    // mid-commit then reads as an interrupted commit, not as
    // corruption — see latestVersion. Deleted after the marker, so a
    // committed corpus whose markers are later lost stays loud.
    f.mkdirs(new Path(s"$root/commits"))
    f.create(initSentinel(root), true).close()
    // heal any mid-swap table root a crashed compact() left behind —
    // writing into a recreated root would make a LATER recover()
    // delete the moved-aside corpus state (the readTable hazard,
    // guarded on the write path too)
    Tables.foreach(t => DirSwap.recover(f, s"$root/$t"))
    writePartition(hashes, "hashes", root, v, Seq("h"))
    writePartition(sigs, "sigs", root, v, Seq("id", "hs", "sig"))
    writePartition(shingles, "shingles", root, v, Seq("doc_id", "split", "h"))
    writePartition(manifest, "manifest", root, v,
      Seq("split", "lang", "bin", "doc_id", "n_tokens"))
    writePartition(dead, "dead", root, v, Seq("doc_id"))
    labels.select(col("id"), col("comp"))
      .write.mode("overwrite").parquet(s"$root/labels/v=$v")
    fs(spark, root).create(markerPath(root, v), true).close() // commit point for recovery
    f.delete(initSentinel(root), false) // marker landed: the sentinel may not outlive it
    writeLatest(spark, root, v)
    v
  }

  /** Commit one ingest's DELTA as version latest+1: the three witness
    * deltas and the accepted manifest rows append as new `ingest`
    * partitions, this ingest's tombstoned doc ids land in `dead`, and
    * only `labels` (small) is written in full. Commit bytes are
    * O(batch), independent of corpus size — StateCommitSpec measures
    * exactly that. */
  def commitDelta(spark: SparkSession, delta: IngestDelta, root: String): Long = {
    val v = latestVersion(spark, root).getOrElse(-1L) + 1L
    commitVersion(spark, root, v,
      hashes = delta.stateDelta.newHashes,
      sigs = delta.stateDelta.newSigs,
      shingles = delta.stateDelta.newShingles,
      manifest = delta.accepted,
      dead = delta.tombstones.select(col("doc_id")),
      labels = delta.state.labels)
  }

  // ---- optimistic concurrency (the rows-90/93 Delta-story close) ----

  private def stagingDir(root: String, token: String) = s"$root/staging/$token"

  /** Atomically claim version `v` for the writer holding `token`:
    * create the commit marker with overwrite = false — exactly one
    * writer wins (the filesystem's create-if-absent is the fence; on
    * HDFS and precondition-capable object stores it is atomic, on a
    * raw local FS it is the strongest primitive available). The
    * marker body carries the winner's staging token so a crash
    * between claim and materialization is completed by any later
    * reader ([[materializePending]]). */
  private def claim(spark: SparkSession, root: String, v: Long,
                    token: String): Boolean = {
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/commits"))
    // token written to a writer-private tmp, then RENAMED into place:
    // the marker becomes visible with its body complete (a created-
    // then-written marker has a window where a concurrent reader sees
    // an EMPTY body, misreads it as a legacy marker, and heals LATEST
    // past a version whose artifacts are still staged). Hadoop rename
    // refuses an existing destination, so the rename IS the fence.
    val tmp = new Path(s"$root/commits/.claim.$token")
    val out = f.create(tmp, true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
    val won = try !f.exists(markerPath(root, v)) &&
      f.rename(tmp, markerPath(root, v))
    catch { case _: java.io.IOException => false }
    if (!won) f.delete(tmp, false)
    won
  }

  /** Finish a claimed-but-unmaterialized commit: rename the staged
    * artifact dirs named by marker v's token into their final
    * homes. Idempotent (renames only missing targets); a no-op for
    * legacy empty-body markers and already-finished commits. */
  private def materializePending(spark: SparkSession, root: String, v: Long): Unit = {
    val f = fs(spark, root)
    val mp = markerPath(root, v)
    if (!f.exists(mp)) return
    val in = f.open(mp)
    val token = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    if (token.isEmpty) return // legacy single-writer marker
    val stage = new Path(stagingDir(root, token))
    if (!f.exists(stage)) return // already materialized
    (Tables :+ "labels").foreach { t =>
      val src = new Path(s"${stagingDir(root, token)}/$t")
      val dst = new Path(
        if (t == "labels") s"$root/labels/v=$v" else s"$root/$t/ingest=$v")
      if (f.exists(src)) {
        // src AND dst both present = a rename-as-copy crashed mid-copy
        // (a COMPLETED rename deletes its source, on any FS), so dst is
        // partial — drop it and redo; skipping it because "dst exists"
        // would commit a half-copied table. On atomic-rename FSs the
        // both-exist state never arises and this stays the plain
        // missing-target rename.
        if (f.exists(dst)) f.delete(dst, true)
        f.mkdirs(dst.getParent)
        require(f.rename(src, dst), s"could not materialize $src -> $dst")
      }
    }
    f.delete(stage, true)
  }

  /** Optimistic conditional commit: compute the delta against the
    * freshest state, stage its artifacts under a writer-private dir,
    * then CLAIM latest+1 atomically — if another writer advanced the
    * corpus first, the claim fails, the staging is discarded, and the
    * delta is RECOMPUTED from the new state (`deltaOf` receives the
    * freshly loaded state each attempt, None for an empty root). Lost
    * updates are impossible by construction: a version number is
    * committed by exactly one writer, and every retry re-reads the
    * winner's state before recomputing. Returns the committed
    * version; fails after `maxAttempts` lost races. */
  def commitDeltaOptimistic(spark: SparkSession, root: String,
                            maxAttempts: Int = 5)
                           (deltaOf: Option[CorpusState] => IngestDelta): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val f = fs(spark, root)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val cur = latestVersion(spark, root)
      val target = cur.getOrElse(-1L) + 1L
      val delta = deltaOf(cur.map(v => loadVersion(spark, root, v)))
      val token = java.util.UUID.randomUUID().toString
      val stage = stagingDir(root, token)
      delta.stateDelta.newHashes.select(col("h"))
        .write.mode("overwrite").parquet(s"$stage/hashes")
      delta.stateDelta.newSigs.select(col("id"), col("hs"), col("sig"))
        .write.mode("overwrite").parquet(s"$stage/sigs")
      delta.stateDelta.newShingles.select(col("doc_id"), col("split"), col("h"))
        .write.mode("overwrite").parquet(s"$stage/shingles")
      delta.accepted
        .select(col("split"), col("lang"), col("bin"), col("doc_id"), col("n_tokens"))
        .write.mode("overwrite").parquet(s"$stage/manifest")
      delta.tombstones.select(col("doc_id"))
        .write.mode("overwrite").parquet(s"$stage/dead")
      delta.state.labels.select(col("id"), col("comp"))
        .write.mode("overwrite").parquet(s"$stage/labels")
      if (claim(spark, root, target, token)) {
        Tables.foreach(t => DirSwap.recover(f, s"$root/$t"))
        materializePending(spark, root, target)
        writeLatest(spark, root, target)
        return target
      }
      // lost the race: discard the staging, reload, recompute
      f.delete(new Path(stage), true)
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the commit race $maxAttempts times under $root")
  }

  /** Commit a freshly bootstrapped corpus as the first version: the
    * full state IS the delta of an initial ingest. */
  def commitBootstrap(spark: SparkSession, state: CorpusState, root: String): Long = {
    val v = latestVersion(spark, root).getOrElse(-1L) + 1L
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schemas("dead"))
    commitVersion(spark, root, v,
      hashes = state.hashes, sigs = state.sigs, shingles = state.shingles,
      manifest = state.manifest, dead = empty, labels = state.labels)
  }

  private def readTable(spark: SparkSession, root: String, table: String,
                        v: Long): DataFrame = {
    val schema = schemas(table).add(StructField("ingest", LongType))
    val p = s"$root/$table"
    val f = fs(spark, root)
    // a compact() crash inside DirSwap.swap leaves the table root
    // moved aside — heal it HERE, on the read path, not only on the
    // next compaction: treating a mid-swap root as an empty table
    // would silently re-admit every shipped doc, and the next commit
    // would recreate the root so a later recover() DELETES the
    // moved-aside corpus state
    DirSwap.recover(f, p)
    require(f.exists(new Path(p)),
      s"state table $p is missing for committed version $v — refusing to " +
        "read a damaged state root as an empty table")
    spark.read.schema(schema).parquet(p)
      .filter(col("ingest") <= v) // partition-pruned: old deltas only
      .drop("ingest")
  }

  /** Reconstruct the state as of version `v` (time travel): pruned
    * delta scans + one anti-join of the accumulated dead set onto
    * shingles and manifest. */
  def loadVersion(spark: SparkSession, root: String, v: Long): CorpusState = {
    val dead = readTable(spark, root, "dead", v)
    CorpusState(
      hashes = readTable(spark, root, "hashes", v),
      sigs = readTable(spark, root, "sigs", v),
      labels = spark.read.schema(schemas("labels")).parquet(s"$root/labels/v=$v"),
      shingles = readTable(spark, root, "shingles", v)
        .join(dead, Seq("doc_id"), "left_anti"),
      manifest = readTable(spark, root, "manifest", v)
        .join(dead, Seq("doc_id"), "left_anti"))
  }

  /** Latest committed state, or None for an untouched root. */
  def load(spark: SparkSession, root: String): Option[CorpusState] =
    latestVersion(spark, root).map(v => loadVersion(spark, root, v))

  /** Consolidate the accumulated delta partitions: rewrite each witness
    * table's live rows (as of LATEST) into a single `ingest=<latest>`
    * partition, apply `dead` physically, and drop superseded label
    * versions. Reads at LATEST are unchanged; time travel BEFORE the
    * compaction point is given up — the same trade a Delta VACUUM
    * makes. Swaps are crash-safe ([[DirSwap]]). Returns the compacted
    * version. */
  def compact(spark: SparkSession, root: String): Long = {
    val v = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"nothing committed under $root"))
    val st = loadVersion(spark, root, v)
    val f = fs(spark, root)
    val rewrite: Seq[(String, DataFrame, Seq[String])] = Seq(
      ("hashes", st.hashes, Seq("h")),
      ("sigs", st.sigs, Seq("id", "hs", "sig")),
      ("shingles", st.shingles, Seq("doc_id", "split", "h")),
      ("manifest", st.manifest, Seq("split", "lang", "bin", "doc_id", "n_tokens")))
    rewrite.foreach { case (table, df, cols) =>
      val tableRoot = s"$root/$table"
      DirSwap.recover(f, tableRoot)
      df.select(cols.map(col): _*)
        .write.mode("overwrite").parquet(s"${DirSwap.tmpDir(tableRoot)}/ingest=$v")
      DirSwap.swap(f, tableRoot)
    }
    // dead is now applied physically; empty the table the same way
    val deadRoot = s"$root/dead"
    DirSwap.recover(f, deadRoot)
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schemas("dead"))
      .write.mode("overwrite").parquet(s"${DirSwap.tmpDir(deadRoot)}/ingest=$v")
    DirSwap.swap(f, deadRoot)
    // labels: drop superseded versions (markers stay — numbering continues)
    val labelsDir = new Path(s"$root/labels")
    f.listStatus(labelsDir).map(_.getPath)
      .filter(p => p.getName.startsWith("v=") && p.getName.drop(2).toLong < v)
      .foreach(p => f.delete(p, true))
    v
  }

  /** Compact when the accumulated delta-partition count crosses
    * `maxDeltas` — the debt policy an ingest loop calls after each
    * commit. Debt is measured from one directory listing; no Spark
    * job. Returns Some(version) when compaction ran. */
  def maybeCompact(spark: SparkSession, root: String,
                   maxDeltas: Int = 16): Option[Long] = {
    val f = fs(spark, root)
    val hashesDir = new Path(s"$root/hashes")
    DirSwap.recover(f, s"$root/hashes") // heal a mid-swap root before counting
    if (!f.exists(hashesDir)) None
    else {
      val deltas = f.listStatus(hashesDir).count(_.getPath.getName.startsWith("ingest="))
      if (deltas > maxDeltas) Some(compact(spark, root)) else None
    }
  }
}
