package graft.sources.v2

import java.util.regex.Pattern

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for WARC/WET archives (SURVEY.md §2 row 277):
  * `spark.read.format("graft.sources.v2.WarcSource").option("path", dir)`
  * yields the same record table as [[graft.sources.Warc.records]],
  * but from FILES — the shape a 100 TB crawl actually ships as
  * (~100k × ~1 GB archives), with the scale levers a source must own
  * surfaced through the V2 contracts instead of bolted on downstream:
  *
  *  - **Partition planning**: one InputPartition per archive file —
  *    the natural split unit (records are variable-length; a byte
  *    split would land mid-record). 100k files → 100k independent
  *    tasks, no shuffle.
  *  - **File pruning** (SupportsPushDownFilters): EqualTo / In /
  *    StringStartsWith predicates on the `file` column prune which
  *    archives are OPENED — a query over one host's archives reads
  *    one host's bytes. Accepted filters are also left in the
  *    residual (returned from pushFilters), so correctness never
  *    depends on the pruning.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): a
  *    rec_type/uri projection never materializes payload strings.
  *
  * The record grammar is the SAME fold as Warc.parseRecords —
  * ported to a sequential Scala loop (marker split + pending glue so
  * in-payload markers reconstruct; truncated/unparseable/junk-tailed
  * records flag `ok = false`, never drop) and spec-pinned equal to
  * the Column fold on shared inputs (WarcSourceSpec). Files decode
  * ISO-8859-1 (byte == char, so Content-Length arithmetic matches
  * the string fold exactly for any byte content). */
class WarcSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "WarcSource requires option 'path'")
    new WarcTable(path)
  }
}

object WarcSource {
  val Marker = "WARC/1.0\r\n"

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rec_pos", LongType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("rec_offset", LongType, nullable = false),
    StructField("warc_date", StringType, nullable = false)))

  private val ClRe = Pattern.compile(
    "^Content-Length:\\s*([0-9]+)\\s*$", Pattern.MULTILINE | Pattern.CASE_INSENSITIVE)
  private val UriRe = Pattern.compile(
    "^WARC-Target-URI:\\s*(\\S+)\\s*$", Pattern.MULTILINE | Pattern.CASE_INSENSITIVE)
  private val TypRe = Pattern.compile(
    "^WARC-Type:\\s*(\\S+)\\s*$", Pattern.MULTILINE | Pattern.CASE_INSENSITIVE)
  private val DateRe = Pattern.compile(
    "^WARC-Date:\\s*(\\S+)\\s*$", Pattern.MULTILINE | Pattern.CASE_INSENSITIVE)

  final case class Rec(recType: String, uri: String, contentLength: Long,
                       body: String, ok: Boolean, offset: Long, date: String)

  private def re1(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.group(1) else ""
  }

  /** Sequential port of Warc.parseRecords' fold — identical branch
    * structure, spec-pinned equal on shared inputs. */
  def parse(content: String): Vector[Rec] = {
    // limit -1: Spark's split keeps trailing empty segments; Java's
    // default limit 0 drops them, which would swallow a final record
    // whose payload ends exactly at a marker boundary
    val segs0 = content.split("WARC/1\\.0\r\n", -1)
    val out = Vector.newBuilder[Rec]
    var pos = segs0.head.length.toLong
    var pend = ""
    def fields(cand: String, he: Int): (String, String, Long, String) = {
      val headers = if (he == 0) cand else cand.substring(0, he - 1)
      val clStr = re1(ClRe, headers)
      // an overflowing declared length must FLAG, never crash (the
      // tolerance contract). Normalized to -1 — the "unparseable
      // length" branch (flag, consume to segment end) — matching the
      // Column fold, whose overflowing cast yields NULL -> -1.
      val cl =
        if (clStr.isEmpty) -1L
        else try clStr.toLong
        catch { case _: NumberFormatException => -1L }
      (re1(UriRe, headers), re1(TypRe, headers), cl, re1(DateRe, headers))
    }
    for (seg <- segs0.iterator.drop(1)) {
      val cand = if (pend.isEmpty) seg else pend + Marker + seg
      val he = cand.indexOf("\r\n\r\n") + 1 // 1-based like instr; 0 = absent
      val (uri, typ, cl, date) = fields(cand, he)
      val consumed = pos + Marker.length + cand.length
      if (he == 0) {
        pend = cand // headers not complete yet
      } else if (cl == -1L) { // unparseable length: flag, consume to end
        out += Rec(typ, uri, -1L, cand.substring(he + 3), ok = false, pos, date)
        pend = ""; pos = consumed
      } else {
        val avail = cand.length.toLong - (he + 3)
        if (avail >= cl) { // complete: junk after the payload flags it
          val body = cand.substring(he + 3, he + 3 + cl.toInt)
          val trailer = cand.substring(he + 3 + cl.toInt)
          val ok = trailer == "" || trailer == "\r\n" || trailer == "\r\n\r\n"
          out += Rec(typ, uri, cl, body, ok, pos, date)
          pend = ""; pos = consumed
        } else pend = cand // payload continues past the split
      }
    }
    if (pend.nonEmpty) { // truncated trailing record: flagged, not dropped
      val he = pend.indexOf("\r\n\r\n") + 1
      val (uri, typ, cl, date) = fields(pend, he)
      val body = if (he == 0) "" else pend.substring(he + 3)
      out += Rec(typ, uri, cl, body, ok = false, pos, date)
    }
    out.result()
  }
}

class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"warc(`$path`)"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path)
}

class WarcScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WarcSource.schema

  /** Accept file-column predicates for pruning; EVERYTHING stays in
    * the residual (returned array), so a pruning bug can only read
    * too much, never return wrong rows. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      case f @ EqualTo("file", _: String) => f
      case f @ In("file", _) => f
      case f @ StringStartsWith("file", _) => f
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new WarcScan(path, pushed, required)
}

final case class WarcFilePartition(filePath: String, fileName: String)
  extends InputPartition

/** Java-serializable Hadoop Configuration carrier (Configuration itself
  * is Writable, not Serializable). The session conf captured on the
  * DRIVER must ride to executors: it carries spark.hadoop.* credentials
  * and fs.* implementations, so an s3a/gcs/abfs path readable at
  * planning time stays readable at read time. A bare
  * `new Configuration()` on the executor would silently drop them. */
final class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

class WarcScan(path: String, pushed: Array[Filter], required: StructType)
  extends Scan with Batch {

  // Captured at scan build time on the DRIVER (where the session is
  // live) and shipped to every reader — see SerializableHadoopConf.
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan path=$path prunedBy=[${pushed.mkString(", ")}]"

  private def keep(name: String): Boolean = pushed.forall {
    case EqualTo("file", v: String) => name == v
    case In("file", vs) => vs.exists(v => v == name)
    case StringStartsWith("file", p) => name.startsWith(p)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    fs.listStatus(p).filter(_.isFile)
      .map(s => (s.getPath.toString, s.getPath.getName))
      // Hadoop-convention hidden/marker files (_SUCCESS, .crc) are
      // not archives
      .filterNot { case (_, name) => name.startsWith(".") || name.startsWith("_") }
      .filter { case (_, name) => keep(name) }
      .sortBy(_._1) // deterministic partition order
      .map { case (full, name) => WarcFilePartition(full, name): InputPartition }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, hadoopConf)
}

class WarcReaderFactory(required: StructType, conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcFilePartition], required, conf)
}

class WarcPartitionReader(part: WarcFilePartition, required: StructType,
                          conf: SerializableHadoopConf)
  extends PartitionReader[InternalRow] {

  private lazy val recs: Vector[WarcSource.Rec] = {
    val p = new Path(part.filePath)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
    // ISO-8859-1: byte == char, so Content-Length arithmetic matches
    // the string fold for ANY byte content
    WarcSource.parse(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
  }
  private var i = -1

  override def next(): Boolean = { i += 1; i < recs.size }

  override def get(): InternalRow = {
    val r = recs(i)
    InternalRow.fromSeq(required.fields.map(_.name).toSeq.map {
      case "file" => UTF8String.fromString(part.fileName)
      case "rec_pos" => i.toLong
      case "rec_type" => UTF8String.fromString(r.recType)
      case "uri" => UTF8String.fromString(r.uri)
      case "content_length" => r.contentLength
      case "body" => UTF8String.fromString(r.body)
      case "ok" => r.ok
      case "rec_offset" => r.offset
      case "warc_date" => UTF8String.fromString(r.date)
    })
  }

  override def close(): Unit = ()
}
