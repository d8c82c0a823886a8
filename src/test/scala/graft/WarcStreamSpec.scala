package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WarcStream

/** Streaming WARC landing (SURVEY.md §2 row 263): literal
  * batch==stream output equality (the transform is stateless), and
  * incremental arrival — records land per micro-batch in append
  * mode with no state store. */
class WarcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NL = "\r\n"

  private def rec(typ: String, uri: String, body: String): String =
    "WARC/1.0" + NL + s"WARC-Type: $typ" + NL +
      s"WARC-Target-URI: $uri" + NL +
      s"Content-Length: ${body.length}" + NL + NL + body + NL + NL

  private def http(html: String): String =
    "HTTP/1.1 200 OK" + NL + "Content-Type: text/html" + NL + NL + html

  private val f1 = ("f1",
    rec("response", "http://a/1", http("the cat and the dog of the house")) +
      rec("conversion", "http://a/1", "el gato y el perro de la casa"))
  private val f2 = ("f2",
    rec("response", "http://b/2", http("to a in the and of")))

  type Out = (String, Long, String, String, Long, Boolean, Long, Long, String)

  private def runStream(batches: Seq[Seq[(String, String)]]): Seq[Out] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val name = s"warcstream_${System.nanoTime()}"
    val q = WarcStream.landing(ms.toDF().toDF("file", "warc"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Out].collect().toSeq.sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("stream output equals the batch transform on the same archives") {
    val batch = WarcStream.landing(Seq(f1, f2).toDF("file", "warc"))
      .as[Out].collect().toSeq.sortBy(r => (r._1, r._2))
    val streamed = runStream(Seq(Seq(f1), Seq(f2)))
    assert(streamed == batch)
    assert(batch.size == 3)
  }

  test("per-record metrics: HTTP headers stripped, WET payloads intact") {
    val out = runStream(Seq(Seq(f1)))
    val resp = out.find(_._3 == "response").get
    assert(resp._9 == "en" && resp._8 == 8L)         // langid + tokens on the ENTITY
    assert(resp._7 < resp._5)                         // n_chars < content_length: headers stripped
    val conv = out.find(_._3 == "conversion").get
    assert(conv._9 == "es" && conv._7 == conv._5)     // WET body == payload
  }

  test("records accumulate across micro-batches, append-only") {
    val out = runStream(Seq(Seq(f1), Seq(f2), Seq()))
    assert(out.map(_._1) == Seq("f1", "f1", "f2"))
  }
}
