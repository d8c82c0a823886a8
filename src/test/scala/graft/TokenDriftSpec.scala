package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Chi-square token drift (SURVEY.md §2 row 182): the hand-computed
  * statistic, the zero-drift anchor, one-sided tokens, the minCount
  * floor, and partitioning invariance. */
class TokenDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drift(rows: Seq[(Long, String)], minCount: Long, parts: Int = 1) =
    Profiling.tokenDrift(
        rows.toDF("snap", "text").repartition(parts),
        col("snap"), col("text"), minCount)
      .orderBy($"token")
      .as[(String, Long, Long, Double)].collect().toSeq

  test("hand-computed chi-square contribution") {
    // snapshot 0: "a a b"; snapshot 1: "a b b b"
    // a: c1=2 c2=1; b: c1=1 c2=3; N1=3 N2=4
    // chi(a) = (2*4 - 1*3)^2 / (3*4*3) = 25/36
    // chi(b) = (1*4 - 3*3)^2 / (3*4*4) = 25/48
    val got = drift(Seq((0L, "a a b"), (1L, "a b b b")), minCount = 1)
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got(0)._4 == 25.0 / 3.0 / 4.0 / 3.0)
    assert(got(1)._4 == 25.0 / 3.0 / 4.0 / 4.0)
  }

  test("identical distributions drift zero") {
    val got = drift(Seq((0L, "x y x"), (1L, "x y x")), minCount = 1)
    assert(got.forall(_._4 == 0.0))
  }

  test("a token present in only one snapshot carries maximal evidence") {
    val got = drift(Seq((0L, "common new"), (1L, "common")), minCount = 1)
    val nw = got.find(_._1 == "new").get
    assert(nw._2 == 1L && nw._3 == 0L && nw._4 > 0.0)
  }

  test("minCount floors rare cells out of the report") {
    val got = drift(Seq((0L, "big big big big big rare"), (1L, "big big")),
      minCount = 3)
    assert(got.map(_._1) == Seq("big"))
  }

  test("partitioning invariance") {
    val rows = (1L to 80L).map(i => (i % 2, s"w${i % 7} w${(i * 3) % 5} base"))
    assert(drift(rows, 5, parts = 1) == drift(rows, 5, parts = 11))
  }
}
