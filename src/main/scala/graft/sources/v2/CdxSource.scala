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
    require(!surt.contains(' ') && !date.contains(' ') &&
      !file.contains(' ') && !url.contains(' '),
      "CDX fields must be space-free (percent-encode upstream)")
    s"$surt $date $file $off $len $digest $url"
  }

  def parseLine(line: String): (String, String, String, Long, Long, Long, String) = {
    val p = line.split(' ')
    require(p.length == 7, s"malformed CDX line (${p.length} fields): $line")
    (p(0), p(1), p(2), p(3).toLong, p(4).toLong, p(5).toLong, p(6))
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
    * simply never promoted. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val f = root.getFileSystem(conf.value)
    if (truncate) {
      Option(f.listStatus(root)).getOrElse(Array.empty)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .foreach(s => f.delete(s.getPath, false))
    }
    f.mkdirs(root)
    messages.foreach { case CdxCommit(staged, name) =>
      val dst = new Path(root, name)
      if (f.exists(dst)) f.delete(dst, false) // idempotent re-commit
      require(f.rename(new Path(staged), dst), s"could not commit $staged -> $dst")
    }
    f.delete(new Path(stagingDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path).getFileSystem(conf.value)
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

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.toString)
      .filterNot(s => new Path(s).getName.startsWith(".") ||
        new Path(s).getName.startsWith("_"))
      .sorted // file order == surt order for a range-partitioned write
      .map(CdxFilePartition(_): InputPartition)
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
