package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table for the CDX archive index (SURVEY.md §2 row
  * 281) — the WRITE companion of [[WarcSource]] (which reads archives
  * but lands its index through generic parquet): Common Crawl
  * publishes the index as sorted plain-text cdx-00xxx files, and this
  * connector closes the read/write loop in that shape.
  *
  *  - **Line format**: one space-separated record per line, SURT
  *    first (`surt warc_date file rec_offset content_length digest
  *    url_canon`) — every field is space-free by construction (SURTs
  *    and canonical URLs are percent-encoded, the rest are numerals),
  *    so the format is self-delimiting, greppable, and mergesortable
  *    by prefix exactly like real CDX.
  *  - **Write protocol**: each task writes a private staging file
  *    under `<path>/_staging/<queryId>/`; the driver-side commit
  *    renames only the files named in the commit messages into the
  *    table root and drops the staging dir — task retries/aborts
  *    leave no visible partials (the v1-committer discipline, here on
  *    the connector's own surface). The session Hadoop conf rides a
  *    [[SerializableHadoopConf]] to the writers, same as the read
  *    path.
  *  - **Sortedness**: a globally `orderBy(surt)`-ed input arrives
  *    range-partitioned, so file i's SURTs all precede file i+1's —
  *    the partition-indexed file names (`part-00000-...`) preserve
  *    the total order on disk, which is what makes a CDX binary-
  *    searchable.
  *  - **Read path**: one InputPartition per file (the WarcSource
  *    planning shape), line-parsed back to the exact schema.
  *
  * Scale: writers stream line-by-line (no buffering of the partition),
  * the commit is O(files) driver-side renames, and a 100k-file index
  * reads as 100k independent tasks. */
class CdxSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdxSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "CdxSource requires option 'path'")
    new CdxTable(path)
  }
}

object CdxSource {
  val schema: StructType = StructType(Seq(
    StructField("surt", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("rec_offset", LongType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("digest", LongType, nullable = false),
    StructField("url_canon", StringType, nullable = false)))

  def formatLine(surt: String, date: String, file: String, off: Long,
                 len: Long, digest: Long, url: String): String = {
    // Write-time validation must match read-time parsing exactly: a
    // space would shift fields, and an EMPTY field would vanish under
    // a limit-less split (java's split drops trailing empties) — so
    // both are rejected here, and parseLine splits with limit -1 so
    // that even a hand-edited line with an empty field fails the
    // 7-field check loudly instead of mis-parsing.
    def ok(s: String) = s.nonEmpty && !s.contains(' ')
    require(ok(surt) && ok(date) && ok(file) && ok(url),
      "CDX fields must be non-empty and space-free (percent-encode upstream)")
    s"$surt $date $file $off $len $digest $url"
  }

  def parseLine(line: String): (String, String, String, Long, Long, Long, String) = {
    val p = line.split(" ", -1)
    require(p.length == 7 && p.forall(_.nonEmpty),
      s"malformed CDX line (${p.length} fields): $line")
    (p(0), p(1), p(2), p(3).toLong, p(4).toLong, p(5).toLong, p(6))
  }

  /** (queryId, partitionIndex) from a connector-written file name, or
    * None for a foreign file. Used by the scan to order partitions
    * NUMERICALLY — a lexicographic sort on the full path would break
    * at 100k partitions (part-100000 < part-99999) and interleave
    * append jobs' files by queryId mid-range. */
  private[v2] val FileName = """part-(\d+)-(.+)\.cdx""".r
  private[v2] def fileKey(name: String): Option[(String, Long)] = name match {
    case FileName(idx, qid) => Some((qid, idx.toLong))
    case _ => None
  }

  /** Listing-order file names of a manifest-less dir — the exact order
    * the fallback scan would read them in: connector-written files by
    * (queryId, NUMERIC partition index), foreign names after,
    * lexicographically. Shared by the scan fallback and by the legacy
    * append seed so "what a listing read showed" and "what the seeded
    * manifest pins" can never disagree. */
  private[v2] def listingOrder(fs: org.apache.hadoop.fs.FileSystem,
                               root: Path): Seq[String] =
    fs.listStatus(root).filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .sortBy { n =>
        fileKey(n) match {
          case Some((qid, idx)) => (0, qid, idx, n)
          case None             => (1, "", 0L, n)
        }
      }.toSeq
}

/** The commit LOG that makes the table transition atomic on object
  * stores. Promoting staged part files is one RENAME PER FILE there
  * (rename-as-copy — no atomic directory move exists), so a crash
  * mid-promote would leave a partial set of new files visible if the
  * scan trusted directory listings. Instead, visibility is gated by a
  * manifest: the LAST step of a commit is creating ONE small file
  * (`_manifests/m%08d-<queryId>.list`) naming the job's part files —
  * a single-object PUT, atomic on every store. Crash before it:
  * promoted files are invisible orphans; the retried job simply
  * commits its own files once (append idempotence). Crash after it:
  * the commit is durable and only best-effort cleanup remains.
  *
  * Replay: manifests sort by version; a `truncate` manifest resets
  * the visible set (overwrite mode), an `append` one extends it.
  * Versions are claimed with create-no-overwrite (the StateStore
  * optimistic-concurrency pattern) so concurrent committers can
  * never share one. Truncate does NOT delete old data before its
  * manifest lands — the old table stays fully readable up to the
  * atomic flip; the superseded files are deleted after, best-effort
  * (failures leave invisible garbage, never a broken table).
  *
  * A table with NO manifest dir (hand-assembled cdx files, or one
  * written before this log existed) falls back to listing — the
  * plain-text interop contract is unchanged. */
private[v2] object CdxManifest {
  import org.apache.hadoop.fs.FileSystem

  private def dir(root: Path) = new Path(root, "_manifests")
  private val Name = """m(\d{8})-.*\.list""".r

  private def versionOf(name: String): Option[Long] = name match {
    case Name(v) => Some(v.toLong)
    case _ => None
  }

  private def listManifests(fs: FileSystem, root: Path): Seq[(Long, Path)] = {
    val d = dir(root)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.flatMap(s =>
      versionOf(s.getPath.getName).map(_ -> s.getPath)).sortBy(_._1)
  }

  /** True when the table already carries a manifest log. A dir without
    * one is either empty/new or a LEGACY table (hand-assembled cdx
    * files, or written before the log existed) whose reads go through
    * the listing fallback — the first manifested commit against such a
    * dir must seed the pre-existing listing or those files silently
    * vanish from reads. */
  def hasLog(fs: FileSystem, root: Path): Boolean = listManifests(fs, root).nonEmpty

  /** Visible part-file names in commit order, or None when the table
    * has no manifest log (foreign/legacy dir → caller falls back to
    * directory listing). */
  def visibleFiles(fs: FileSystem, root: Path): Option[Seq[String]] = {
    val ms = listManifests(fs, root)
    if (ms.isEmpty) None
    else Some(ms.foldLeft(Vector.empty[String]) { case (acc, (_, p)) =>
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
      try {
        val mode = in.readLine()
        val files = Iterator.continually(in.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty).toVector
        if (mode == "truncate") files else acc ++ files
      } finally in.close()
    })
  }

  /** Land `files` as one atomic commit; returns the claimed version.
    * The create(overwrite = false) is the linearization point.
    *
    * Failure discipline: a create refusal counts as a version RACE
    * only when the path verifiably exists afterwards (the explicit
    * `FileAlreadyExistsException`, or a generic IOException with
    * `fs.exists` confirming a winner landed — some stores surface the
    * conditional-PUT conflict as a bare IOException). Anything else —
    * endpoint down, auth revoked, persistent 500s — is rethrown so the
    * job FAILS instead of spinning through version numbers forever.
    * The attempt cap bounds even a pathological store that keeps
    * materializing every probed version under a live writer storm. */
  private val MaxCommitAttempts = 1000
  def commit(fs: FileSystem, root: Path, queryId: String,
             files: Seq[String], truncate: Boolean): Long = {
    fs.mkdirs(dir(root))
    var v = listManifests(fs, root).lastOption.map(_._1 + 1).getOrElse(1L)
    var attempts = 0
    var out: org.apache.hadoop.fs.FSDataOutputStream = null
    while (out == null) {
      val p = new Path(dir(root), f"m$v%08d-$queryId.list")
      attempts += 1
      try out = fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          val raced = e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
            e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
            (try fs.exists(p) catch { case _: java.io.IOException => false })
          if (!raced || attempts >= MaxCommitAttempts)
            throw new java.io.IOException(
              s"CDX manifest commit failed after $attempts attempt(s) at $p", e)
          v += 1 // version raced: a winner holds this slot, try the next
      }
    }
    try {
      val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        out, java.nio.charset.StandardCharsets.UTF_8))
      w.write(if (truncate) "truncate" else "append"); w.write('\n')
      files.foreach { f => w.write(f); w.write('\n') }
      w.flush(); w.close()
    } finally out.close()
    v
  }

  /** Best-effort post-truncate GC: drop manifests below `version` and
    * data files the new manifest does not name. Runs strictly AFTER
    * the atomic flip — any failure leaves invisible garbage only. */
  def pruneBelow(fs: FileSystem, root: Path, version: Long,
                 keep: Set[String]): Unit = {
    try {
      listManifests(fs, root).filter(_._1 < version)
        .foreach { case (_, p) => fs.delete(p, false) }
      fs.listStatus(root)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !keep.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    } catch { case _: java.io.IOException => () }
  }
}

class CdxTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"cdx(`$path`)"
  override def schema(): StructType = CdxSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdxScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      CdxSource.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"CDX write schema must be ${CdxSource.schema.simpleString}, " +
        s"got ${info.schema().simpleString}")
    new CdxWriteBuilder(path, info.queryId())
  }
}

// ---- write path -------------------------------------------------------------

class CdxWriteBuilder(path: String, queryId: String)
  extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new CdxBatchWrite(path, queryId, doTruncate,
      new SerializableHadoopConf(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
  }
}

final case class CdxCommit(stagedFile: String, finalName: String)
  extends WriterCommitMessage

class CdxBatchWrite(path: String, queryId: String, truncate: Boolean,
                    conf: SerializableHadoopConf) extends BatchWrite {
  private def stagingDir = s"$path/_staging/$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CdxWriterFactory(stagingDir, queryId, conf)

  /** Only files named by committed tasks become visible; Spark
    * guarantees one commit message per successful task, so speculative
    * or retried attempts (which staged under distinct taskIds) are
    * simply never promoted.
    *
    * Object-store crash discipline (proven in CdxSourceSpec over the
    * `graftoss:` rename-as-copy FS): the per-file promotes can die at
    * any point and the table never shows a partial — promoted files
    * stay INVISIBLE until the manifest write, which is one atomic
    * single-file create ([[CdxManifest.commit]], the linearization
    * point). Truncate deletes nothing up front; superseded data is
    * pruned best-effort only after the flip. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val f = root.getFileSystem(conf.value)
    f.mkdirs(root)
    // partition order, so the manifest preserves a sorted write's order
    val ordered = messages.map { case c: CdxCommit => c }
      .sortBy(c => CdxSource.fileKey(c.finalName).map(_._2).getOrElse(0L))
    ordered.foreach { case CdxCommit(staged, name) =>
      val dst = new Path(root, name)
      if (f.exists(dst)) f.delete(dst, false) // idempotent re-commit
      require(f.rename(new Path(staged), dst), s"could not commit $staged -> $dst")
    }
    // Legacy-append seed: the FIRST manifested commit against a dir
    // that already holds visible cdx files (hand-assembled, or written
    // before the log existed) must name those files too — otherwise
    // the new manifest becomes the whole visible set and every
    // pre-existing row silently vanishes from reads. Truncate mode
    // needs no seed (it replaces the visible set by definition). The
    // seed lists the dir in the exact fallback-scan order, so the read
    // order before and after the commit agrees on the legacy prefix.
    val legacy =
      if (truncate || CdxManifest.hasLog(f, root)) Seq.empty[String]
      else CdxSource.listingOrder(f, root)
        .filterNot(ordered.map(_.finalName).toSet)
    val names = ordered.map(_.finalName).toSeq
    val v = CdxManifest.commit(f, root, queryId, legacy ++ names, truncate)
    if (truncate) CdxManifest.pruneBelow(f, root, v, names.toSet)
    f.delete(new Path(stagingDir), true)
  }

  /** Drop the staging dir AND any files this job already promoted —
    * they carry no manifest, so they were never visible; deleting them
    * just keeps a crashed job from leaving orphans for the GC. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val f = root.getFileSystem(conf.value)
    messages.foreach {
      case CdxCommit(_, name) =>
        try f.delete(new Path(root, name), false)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
    f.delete(new Path(stagingDir), true)
  }
}

class CdxWriterFactory(stagingDir: String, queryId: String,
                       conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CdxDataWriter(stagingDir, queryId, partitionId, taskId, conf)
}

class CdxDataWriter(stagingDir: String, queryId: String, partitionId: Int,
                    taskId: Long, conf: SerializableHadoopConf)
  extends DataWriter[InternalRow] {
  // partition-indexed final name preserves a range-partitioned input's
  // total order across ONE job's files; the queryId keeps a later
  // append job from colliding with (and silently replacing) an earlier
  // job's part files; the taskId suffix keeps retried attempts from
  // colliding in staging
  private val finalName = f"part-$partitionId%05d-$queryId.cdx"
  private val staged = new Path(s"$stagingDir/attempt-$taskId-$finalName")
  // opened lazily but TRACKED: abort on a writer that never wrote must
  // not force-create the staged file just to close it
  private var out: java.io.BufferedWriter = _
  private def writer: java.io.BufferedWriter = {
    if (out == null) {
      val f = staged.getFileSystem(conf.value)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        f.create(staged, true), java.nio.charset.StandardCharsets.UTF_8))
    }
    out
  }

  override def write(r: InternalRow): Unit = {
    writer.write(CdxSource.formatLine(r.getUTF8String(0).toString,
      r.getUTF8String(1).toString, r.getUTF8String(2).toString,
      r.getLong(3), r.getLong(4), r.getLong(5), r.getUTF8String(6).toString))
    writer.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    writer.close() // an empty partition still commits its (empty) file
    CdxCommit(staged.toString, finalName)
  }

  override def abort(): Unit = {
    if (out != null) {
      out.close()
      val f = staged.getFileSystem(conf.value)
      f.delete(staged, false); ()
    }
  }

  override def close(): Unit = ()
}

// ---- read path --------------------------------------------------------------

class CdxScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new CdxScan(path)
}

final case class CdxFilePartition(filePath: String) extends InputPartition

class CdxScan(path: String) extends Scan with Batch {
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = CdxSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"CdxScan path=$path"

  /** Partition order: a manifest-logged table reads its files in
    * COMMIT order (each job's files contiguous, in partition order —
    * [[CdxManifest]]); files promoted by a crashed commit carry no
    * manifest and are never read. A manifest-less dir (hand-assembled
    * cdx files, pre-log tables) falls back to listing, ordered by
    * (queryId, NUMERIC partition index) — numeric so the ordering
    * survives >99,999 partitions (a lexicographic path sort would put
    * part-100000 before part-99999). Either way "file order == surt
    * order" holds GLOBALLY only for a single overwrite job's output
    * (the q_cdx_source shape); under append mode it holds per-job,
    * which is the CDX merge-shard contract. Foreign file names sort
    * after, lexicographically. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    val files: Seq[Path] = CdxManifest.visibleFiles(fs, p) match {
      case Some(names) => names.map(new Path(p, _))
      case None =>
        CdxSource.listingOrder(fs, p).map(new Path(p, _))
    }
    files.map(q => CdxFilePartition(q.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdxReaderFactory(hadoopConf)
}

class CdxReaderFactory(conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdxPartitionReader(partition.asInstanceOf[CdxFilePartition], conf)
}

class CdxPartitionReader(part: CdxFilePartition, conf: SerializableHadoopConf)
  extends PartitionReader[InternalRow] {

  private val reader = {
    val p = new Path(part.filePath)
    val f = p.getFileSystem(conf.value)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      f.open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var line: String = _

  override def next(): Boolean = { line = reader.readLine(); line != null }

  override def get(): InternalRow = {
    val (surt, date, file, off, len, digest, url) = CdxSource.parseLine(line)
    InternalRow(UTF8String.fromString(surt), UTF8String.fromString(date),
      UTF8String.fromString(file), off, len, digest, UTF8String.fromString(url))
  }

  override def close(): Unit = reader.close()
}
