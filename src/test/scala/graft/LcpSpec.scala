package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hygiene
import graft.plans.LcpLen

/** Group-LCP template detection (SURVEY.md §2 row 178): the
  * LCP(min,max) set identity by brute force, code-point counting on
  * multibyte boundaries, codegen≡interpreted, NULL handling, and the
  * seeded registered shape. */
class LcpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lcp(a: String, b: String): Long =
    LcpLen.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("kernel: ASCII prefixes, containment, equality, empties") {
    assert(lcp("template body A", "template body B") == 14)
    assert(lcp("abc", "abcdef") == 3)
    assert(lcp("same", "same") == 4)
    assert(lcp("", "x") == 0)
    assert(lcp("", "") == 0)
    assert(lcp("x", "y") == 0)
  }

  test("kernel counts code points and never splits a multibyte char") {
    assert(lcp("héllo", "héllp") == 4, "é is ONE code point")
    // é (C3 A9) vs è (C3 A8): shared lead byte C3 must not count
    assert(lcp("é", "è") == 0)
    assert(lcp("aé", "aè") == 1)
    // astral plane (4-byte): 𝄞 vs 𝄢 share 3 leading bytes
    assert(lcp("𝄞", "𝄢") == 0)
    assert(lcp("x𝄞", "x𝄞") == 2)
  }

  test("LCP(min,max) equals brute-force set LCP (random sets)") {
    val rnd = new scala.util.Random(42)
    def bruteLcp(xs: Seq[String]): Int = {
      val shortest = xs.map(_.length).min
      (0 until shortest).takeWhile(i => xs.forall(_.charAt(i) == xs.head.charAt(i))).size
    }
    (1 to 200).foreach { _ =>
      val n = 2 + rnd.nextInt(6)
      val pref = ("ab" * rnd.nextInt(4)).take(rnd.nextInt(5))
      val xs = Seq.fill(n)(pref + Seq.fill(rnd.nextInt(4))(
        ('a' + rnd.nextInt(3)).toChar).mkString)
      assert(lcp(xs.min, xs.max) == bruteLcp(xs).toLong, xs.toString)
    }
  }

  test("expression: codegen and interpreted agree, null-safe") {
    val df = Seq(("tmpl aa", "tmpl ab"), ("x", null)).toDF("a", "b")
    def run() = df.select(LcpLen.lcp_len($"a", $"b")).collect().toSeq
    val cg = run()
    val interp = {
      val conf = spark.conf
      val old = (conf.getOption("spark.sql.codegen.wholeStage"),
        conf.getOption("spark.sql.codegen.factoryMode"))
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run() finally {
        old._1.fold(conf.unset("spark.sql.codegen.wholeStage"))(
          conf.set("spark.sql.codegen.wholeStage", _))
        old._2.fold(conf.unset("spark.sql.codegen.factoryMode"))(
          conf.set("spark.sql.codegen.factoryMode", _))
      }
    }
    assert(cg == interp)
    assert(cg.head.getLong(0) == 6L && cg(1).isNullAt(0))
  }

  test("groupLcp: template recovered per group; NULLs carry no evidence") {
    val df = Seq(
      ("s1", "HDR alpha"), ("s1", "HDR beta"), ("s1", null),
      ("s2", "solo full text"),
      ("s3", null.asInstanceOf[String]))
      .toDF("source", "text")
    val got = Hygiene.groupLcp(df, "source", "text")
      .orderBy($"source")
      .as[(String, Long, Option[Long], Option[String])].collect().toSeq
    assert(got(0) == (("s1", 2L, Some(4L), Some("HDR "))))
    assert(got(1) == (("s2", 1L, Some(14L), Some("solo full text"))))
    assert(got(2)._2 == 0L && got(2)._3.isEmpty)
  }

  test("partitioning invariance on the seeded registered query shape") {
    val docs = (1L to 60L).map(i => (s"src${i % 4}", s"body w${i % 7} tail"))
      .toDF("source", "text")
    val seeded = docs.select($"source",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("["), $"source",
        org.apache.spark.sql.functions.lit("] "), $"text").as("text"))
    val a = Hygiene.groupLcp(seeded, "source", "text").collect().toSet
    val b = Hygiene.groupLcp(seeded.repartition(13), "source", "text").collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
