package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational2
import graft.sources.Tables

/** The histogram-ladder quantile sketch behind q_approx_quantiles
  * (round 15): by construction the p-estimate is the upper cent bound
  * of the first $100 bucket reaching rank ceil(p·n/100), so
  * est ∈ [exact_quantile, exact_quantile + width). Also keeps Spark's
  * percentile_approx builtin covered now that the registered query no
  * longer uses it. */
class QuantileLadderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 10000L

  test("ladder estimates bracket the exact quantiles within one bucket width") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_returnflag",
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val exact = li.as[(String, Long)].collect().groupBy(_._1).map {
      case (flag, rows) =>
        val sorted = rows.map(_._2).sorted
        def q(p: Int) = sorted(((p.toLong * sorted.length + 99) / 100).toInt - 1)
        flag -> (q(25), q(50), q(75), sorted.length.toLong)
    }
    val got = Relational2.approxQuantiles(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (flag, p25, p50, p75, n) =>
      val (e25, e50, e75, en) = exact(flag)
      assert(n == en, s"$flag n")
      for ((est, ex) <- Seq((p25, e25), (p50, e50), (p75, e75))) {
        assert(est >= ex && est < ex + W, s"$flag est=$est exact=$ex")
      }
    }
  }

  test("spark builtin percentile_approx stays close to the exact median") {
    val rows = Tables.lineitem(spark, TestSpark.sf)
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("ap"),
        expr("percentile(l_extendedprice, 0.5)").as("ex"))
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    // accuracy 10000 on ~10k-row groups: near-exact
    assert(rows.forall { case (_, ap, ex) => math.abs(ap - ex) / ex <= 0.01 },
      rows.mkString(", "))
  }
}
