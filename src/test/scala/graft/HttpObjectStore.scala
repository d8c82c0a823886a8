package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A blob OBJECT STORE served over real loopback HTTP, plus the Hadoop
  * FileSystem client that mounts it as `grafths://` — the closest a
  * no-egress sandbox gets to "an actual cloud round-trip has run":
  * every byte Spark reads or writes crosses a real socket as a real
  * HTTP request against a flat blob namespace with S3-like semantics:
  *
  *  - objects are immutable blobs PUT whole on stream close (no
  *    append, no partial visibility — readers see old-or-new, never
  *    half);
  *  - there are no real directories: a "dir" exists iff a marker
  *    object or any object under the prefix does (mkdirs writes a
  *    marker, the S3A convention) — the empty-dir-vanishes hazard is
  *    faithfully present;
  *  - rename is CLIENT-side copy-then-delete per object (the
  *    CloudRenameSpec reality, now over the wire);
  *  - a fault budget can be armed server-side: the next N PUTs fail
  *    with HTTP 500 AFTER the budget arms — injected mid-commit
  *    crashes are real failed network writes, not thrown exceptions.
  *
  * Test-scope by design: the point is proving the engine's commit
  * protocols against a store with these semantics, not shipping a
  * connector. */
object HttpObjectStore {
  final case class Blob(bytes: Array[Byte], mtime: Long)

  /** One in-process store; `endpoint` goes into the Hadoop conf. */
  final class Server {
    private[graft] val blobs = new ConcurrentHashMap[String, Blob]()
    // 0 = disarmed; claimed atomically so concurrent PUTs never
    // over- or under-consume the budget
    val putFailBudget = new AtomicInteger(0)
    val puts = new AtomicInteger(0)
    def armPutFailures(n: Int): Unit = putFailBudget.set(n)
    def disarm(): Unit = putFailBudget.set(0)
    private def claimFailure(): Boolean =
      putFailBudget.getAndUpdate(v => if (v > 0) v - 1 else v) > 0

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) x.getResponseBody.write(body)
      x.close()
    }

    server.createContext("/", (x: HttpExchange) => {
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      (x.getRequestMethod, x.getRequestURI.getPath) match {
        case ("PUT", "/obj") =>
          val body = x.getRequestBody.readAllBytes()
          if (claimFailure())
            respond(x, 500, "injected store failure".getBytes)
          else {
            blobs.put(params("path"), Blob(body, System.currentTimeMillis()))
            puts.incrementAndGet()
            respond(x, 200, Array.empty)
          }
        case ("GET", "/obj") =>
          val b = blobs.get(params("path"))
          if (b == null) respond(x, 404, Array.empty)
          else respond(x, 200, b.bytes)
        case ("DELETE", "/obj") =>
          x.getRequestBody.readAllBytes()
          respond(x, if (blobs.remove(params("path")) != null) 200 else 404, Array.empty)
        case ("GET", "/list") =>
          val pre = params.getOrElse("prefix", "")
          val sb = new StringBuilder
          blobs.forEach { (k, v) =>
            if (k.startsWith(pre)) sb.append(s"$k\t${v.bytes.length}\t${v.mtime}\n")
          }
          respond(x, 200, sb.toString.getBytes("UTF-8"))
        case _ => respond(x, 400, Array.empty)
      }
    })
    server.start()
    def stop(): Unit = server.stop(0)
  }
}

/** Hadoop FileSystem client for [[HttpObjectStore.Server]]. Flat blob
  * keys are the path strings without scheme/authority; every operation
  * is one or more real HTTP round-trips. Must be top-level with a
  * no-arg ctor (Hadoop reflection); the endpoint rides in the conf key
  * `fs.grafths.endpoint`. */
class HttpObjectStoreFs extends FileSystem {
  private var endpoint: String = _
  private var uri: URI = _
  private var wd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    endpoint = conf.get("fs.grafths.endpoint")
    require(endpoint != null, "fs.grafths.endpoint not set")
    uri = URI.create("grafths:///")
  }
  override def getUri: URI = uri
  override def getScheme: String = "grafths"

  private def key(p: Path): String = {
    val s = Path.getPathWithoutSchemeAndAuthority(p).toString
    if (s == "/") "/" else s.stripSuffix("/")
  }
  private def dirMarker(k: String): String =
    (if (k == "/") "" else k) + "/.dir"

  private def http(method: String, path: String, qk: String, qv: String,
                   body: Array[Byte] = null): (Int, Array[Byte]) = {
    val url = s"$endpoint$path?$qk=${java.net.URLEncoder.encode(qv, "UTF-8")}"
    val c = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    if (body != null) { c.setDoOutput(true); c.getOutputStream.write(body) }
    val code = c.getResponseCode
    val bytes =
      if (code / 100 == 2) {
        val in = c.getInputStream
        try in.readAllBytes() finally in.close()
      } else {
        Option(c.getErrorStream).foreach { s => s.readAllBytes(); s.close() }
        Array.empty[Byte]
      }
    (code, bytes)
  }

  private def listRaw(prefix: String): Seq[(String, Long, Long)] = {
    val (code, body) = http("GET", "/list", "prefix", prefix)
    if (code != 200) throw new IOException(s"list $prefix: HTTP $code")
    new String(body, "UTF-8").split("\n").filter(_.nonEmpty).toSeq.map { l =>
      val Array(k, sz, mt) = l.split("\t")
      (k, sz.toLong, mt.toLong)
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val (code, body) = http("GET", "/obj", "path", key(f))
    if (code == 404) throw new FileNotFoundException(f.toString)
    if (code != 200) throw new IOException(s"open $f: HTTP $code")
    new FSDataInputStream(new HttpObjectStoreFs.SeekableBytes(body))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && existsObject(key(f)))
      throw new FileAlreadyExistsException(f.toString)
    val k = key(f)
    val buf = new ByteArrayOutputStream()
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        val (code, _) = http("PUT", "/obj", "path", k, buf.toByteArray)
        if (code != 200) throw new IOException(s"PUT $k: HTTP $code")
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("objects are immutable")

  private def existsObject(k: String): Boolean =
    http("GET", "/obj", "path", k)._1 == 200

  /** Copy-then-delete per object — rename-as-copy over the wire. */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src); val dk = key(dst)
    val st = try getFileStatus(src) catch { case _: FileNotFoundException => return false }
    if (existsObject(dk) || existsObject(dirMarker(dk))) return false
    if (st.isFile) {
      val (_, body) = http("GET", "/obj", "path", sk)
      val (code, _) = http("PUT", "/obj", "path", dk, body)
      if (code != 200) throw new IOException(s"rename PUT $dk: HTTP $code")
      http("DELETE", "/obj", "path", sk)
      true
    } else {
      listRaw(sk + "/").foreach { case (k, _, _) =>
        val nk = dk + k.stripPrefix(sk)
        val (_, body) = http("GET", "/obj", "path", k)
        val (code, _) = http("PUT", "/obj", "path", nk, body)
        if (code != 200) throw new IOException(s"rename PUT $nk: HTTP $code")
        http("DELETE", "/obj", "path", k)
      }
      true
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val children = listRaw(if (k == "/") "/" else k + "/")
    if (children.nonEmpty && !recursive)
      throw new IOException(s"$f is a non-empty directory")
    var any = false
    children.foreach { case (ck, _, _) =>
      any |= http("DELETE", "/obj", "path", ck)._1 == 200 }
    any |= http("DELETE", "/obj", "path", k)._1 == 200
    any
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    val st = getFileStatus(f) // throws FileNotFoundException if absent
    if (st.isFile) return Array(st)
    val pre = if (k == "/") "/" else k + "/"
    val entries = listRaw(pre)
    val files = entries.filter { case (ck, _, _) =>
      !ck.stripPrefix(pre).contains("/") && !ck.endsWith("/.dir") }
    val subdirs = entries.flatMap { case (ck, _, _) =>
      val rest = ck.stripPrefix(pre)
      if (rest.contains("/")) Some(rest.takeWhile(_ != '/')) else None
    }.distinct
    (files.map { case (ck, sz, mt) =>
      new FileStatus(sz, false, 1, 1 << 20, mt, new Path(s"grafths://$ck"))
    } ++ subdirs.map { d =>
      new FileStatus(0, true, 1, 1 << 20, 0, new Path(s"grafths://$pre$d"))
    }).toArray
  }

  override def setWorkingDirectory(dir: Path): Unit = wd = dir
  override def getWorkingDirectory: Path = wd

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val (code, _) = http("PUT", "/obj", "path", dirMarker(key(f)), Array.empty[Byte])
    if (code != 200) throw new IOException(s"mkdirs $f: HTTP $code")
    true
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (k == "/") return new FileStatus(0, true, 1, 1 << 20, 0, f)
    val entries = listRaw(k)
    entries.find(_._1 == k) match {
      case Some((_, sz, mt)) => new FileStatus(sz, false, 1, 1 << 20, mt, f)
      case None =>
        // a dir exists iff its marker or anything under the prefix does
        if (entries.exists(_._1.startsWith(k + "/")))
          new FileStatus(0, true, 1, 1 << 20, 0, f)
        else throw new FileNotFoundException(f.toString)
    }
  }
}

object HttpObjectStoreFs {
  /** In-memory body with the Seekable/PositionedReadable contract the
    * parquet reader needs. */
  final class SeekableBytes(bytes: Array[Byte]) extends ByteArrayInputStream(bytes)
      with Seekable with PositionedReadable {
    override def seek(p: Long): Unit = { pos = p.toInt }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException(s"readFully past end at $position+$length")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
