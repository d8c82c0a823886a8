package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Dyadic EWMA (SURVEY.md §2 row 287): hand-computed weights, the
  * self-normalizing short-history head, window truncation, key
  * isolation, and partitioning invariance. */
class EwmaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], w: Int) =
    Analytics.ewmaDyadic(rows.toDF("k", "t", "v"),
        col("k"), Seq(col("t")), col("v"), w)
      .orderBy(col("k"), col("t"))
      .select(col("k"), col("t"), col("ewma_num"), col("ewma_den"), col("ewma"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

  test("w=2: newest weighs 2, previous 1; head self-normalizes") {
    val got = run(Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L)), w = 2)
    assert(got == Seq(
      (1L, 1L, 20L, 2L, 10.0),           // head: only 2^1*10 / 2
      (1L, 2L, 50L, 3L, 50.0 / 3.0),     // 2*20 + 1*10 over 3
      (1L, 3L, 80L, 3L, 80.0 / 3.0)))    // window drops the 10
  }

  test("w=4 full window: weights 8,4,2,1 and den 15") {
    val got = run((1 to 5).map(i => (1L, i.toLong, i.toLong * 100)), w = 4)
    val last = got.last
    // 8*500 + 4*400 + 2*300 + 1*200 = 6400 over 15
    assert(last._3 == 6400L && last._4 == 15L)
    assert(last._5 == 6400.0 / 15.0)
  }

  test("constant series: ewma equals the constant at every length") {
    val got = run((1 to 6).map(i => (1L, i.toLong, 7L)), w = 4)
    assert(got.forall(_._5 == 7.0))
    assert(got.forall(r => r._3 == 7L * r._4))
  }

  test("keys are isolated and partitioning does not change results") {
    val rows = (1 to 200).map(i => ((i % 5).toLong, i.toLong, (i * 13 % 97).toLong))
    val a = run(rows, w = 8)
    val b = Analytics.ewmaDyadic(rows.toDF("k", "t", "v").repartition(11),
        col("k"), Seq(col("t")), col("v"), w = 8)
      .orderBy(col("k"), col("t"))
      .select(col("k"), col("t"), col("ewma_num"), col("ewma_den"), col("ewma"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(a == b)
    // a key's first row never sees another key's history
    assert(a.filter(_._2 <= 5).forall(r => r._5 == (r._2 * 13 % 97).toDouble))
  }
}
