package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Join fan-out pre-flight (SURVEY.md §2 row 200): the Σ cnt·cnt
  * identity against an executed join, per-key products, unmatched and
  * NULL key exclusion, top-k truncation, and partitioning
  * invariance. */
class JoinFanoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fan(as: Seq[Option[Int]], bs: Seq[Option[Int]], topK: Int = 10,
                  parts: Int = 1) =
    Profiling.joinFanout(
        as.toDF("k").repartition(parts), col("k"),
        bs.toDF("k").repartition(parts), col("k"), topK)
      .orderBy($"n_out".desc, $"key")
      .as[(String, Long, Long, Long)].collect().toSeq

  test("per-key products and the total match the executed join size") {
    val as = Seq(Some(1), Some(1), Some(2), Some(3))
    val bs = Seq(Some(1), Some(2), Some(2), Some(2))
    val got = fan(as, bs)
    // key 1: 2·1=2, key 2: 1·3=3, key 3 unmatched → total 5
    assert(got.find(_._1 == "2").get == (("2", 1L, 3L, 3L)))
    assert(got.find(_._1 == "1").get == (("1", 2L, 1L, 2L)))
    assert(!got.exists(_._1 == "3"))
    val executed = as.flatten.toDF("k").join(bs.flatten.toDF("k"), "k").count()
    assert(got.find(_._1 == "__total__").get._4 == executed)
  }

  test("NULL keys never count") {
    val got = fan(Seq(Some(1), None, None), Seq(Some(1), None))
    assert(got.find(_._1 == "__total__").get == (("__total__", 1L, 1L, 1L)))
  }

  test("top-k keeps the k largest products with the key tiebreak") {
    val as = (1 to 5).flatMap(k => Seq.fill(k)(Some(k)))
    val got = fan(as, as, topK = 2)
    assert(got.map(_._1) == Seq("__total__", "5", "4"))
    assert(got.find(_._1 == "5").get._4 == 25L)
  }

  test("disjoint key spaces report a zero total") {
    val got = fan(Seq(Some(1)), Seq(Some(2)))
    assert(got == Seq(("__total__", 0L, 0L, 0L)))
  }

  test("partitioning invariance") {
    val as = (1 to 300).map(i => Some(i % 17))
    val bs = (1 to 200).map(i => Some(i % 23))
    assert(fan(as, bs, 5, parts = 1) == fan(as, bs, 5, parts = 13))
  }

  test("plan pin: top-k is TakeOrderedAndProject, no rank window") {
    val p = Profiling.joinFanout(
        (1 to 100).map(i => i % 7).toDF("k"), col("k"),
        (1 to 100).map(i => i % 5).toDF("k"), col("k"), 3)
      .queryExecution.executedPlan.toString
    // a pre-flight audit must stay cheap: per-partition heaps + a
    // k-row driver merge, never a single-task global rank window
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }
}
