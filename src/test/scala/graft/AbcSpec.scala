package graft

import org.scalatest.funsuite.AnyFunSuite

/** ABC classification (SURVEY.md §2 row 227): class conservation,
  * threshold shares, and the cumulative-order determinism on the real
  * workload (the class derivation itself is oracle-gated; the spec
  * pins the invariants). */
class AbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val got = graft.operators.Relational2.abcClasses(spark, TestSpark.sf)
    .as[(String, Long, Long)].collect().toSeq

  test("all three classes report, ordered A, B, C") {
    assert(got.map(_._1) == Seq("A", "B", "C"))
  }

  test("customer and revenue totals conserve against a direct aggregate") {
    val direct = graft.sources.Tables.orders(spark, TestSpark.sf)
      .groupBy($"o_custkey")
      .agg((org.apache.spark.sql.functions.sum(
        $"o_totalprice".cast("decimal(12,2)")) * 100).cast("long").as("c"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum($"c"))
      .as[(Long, Long)].head()
    assert(got.map(_._2).sum == direct._1)
    assert(got.map(_._3).sum == direct._2)
  }

  test("class A covers at most 80% of revenue plus one boundary customer") {
    val total = got.map(_._3).sum
    val a = got.find(_._1 == "A").get
    // every A customer's cumulative is <= 80% — so A revenue <= 80%
    assert(a._3 * 100 <= total * 80)
    // and A holds fewer customers than the corpus (the Pareto shape)
    assert(a._2 < got.map(_._2).sum)
  }

  test("B revenue keeps cumulative within 95%") {
    val total = got.map(_._3).sum
    val ab = got.filter(r => r._1 == "A" || r._1 == "B").map(_._3).sum
    assert(ab * 100 <= total * 95)
  }

  test("plan pin: no unpartitioned window over the customer frame") {
    val p = graft.operators.Relational2.abcClasses(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the DESC-cumulative runs on the bucketed prefix engine: the only
    // unpartitioned window rides the bounded __b cut frame, the
    // customer-frame cumsum is partitioned by __b
    assert("windowspecdefinition\\((?!__)".r.findFirstIn(p).isEmpty, p)
    assert("windowspecdefinition\\(__b#\\d+[^,]*, cents#".r.findFirstIn(p).nonEmpty, p)
  }
}
