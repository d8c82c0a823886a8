package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Markdown

/** Markdown linearization (SURVEY.md §2 row 289): each stripping rule
  * on a constructed doc, pass-order dependencies (images before
  * links; fences before inline code), counts, and the NULL posture. */
class MarkdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lin(md: String) =
    Markdown.linearize(Seq((1L, md)).toDF("id", "md"), col("id"), col("md"))
      .as[(Long, String, Long, Long, Long, Long)].collect().head

  test("links and images keep their text, not their URLs") {
    val r = lin("See [the docs](http://a/b) and ![alt text](http://img).")
    assert(r._2 == "See the docs and alt text.")
    assert(r._3 == 1L && r._4 == 1L) // one link, one image
  }

  test("fenced code is dropped whole; inline code unwraps") {
    val r = lin("before\n```\nval x = [not](a-link)\n```\nafter `id_name` done")
    assert(r._2 == "before after id_name done")
    // counts audit the RAW bytes: the bracket pair inside the fence
    // still counts as a link even though stripping never sees it
    assert(r._5 == 1L && r._3 == 1L)
  }

  test("counts audit the raw markdown, stripping audits the prose") {
    val r = lin("```\n[in-fence](x)\n```")
    assert(r._2 == "" && r._3 == 1L && r._5 == 1L)
  }

  test("headings, blockquotes, bullets and emphasis all strip") {
    val r = lin("## Title\n> quoted line\n- item **bold** and _it_\n1. numbered")
    assert(r._2 == "Title quoted line item bold and it numbered")
    assert(r._6 == 1L)
  }

  test("an unterminated fence consumes to end; NULL markdown is empty") {
    val r = lin("keep\n```\nnever closed")
    assert(r._2 == "keep" && r._5 == 1L)
    val n = Markdown.linearize(
      Seq((1L, null: String)).toDF("id", "md"), col("id"), col("md"))
      .as[(Long, String, Long, Long, Long, Long)].collect().head
    assert(n._2 == "" && n._3 == 0L && n._6 == 0L)
  }
}
