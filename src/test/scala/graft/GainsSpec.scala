package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** Gains/lift table (SURVEY.md §2 row 206): hand-computed deciles on a
  * perfect ranker, the full-capture tail, the random-ranker lift ≈ 1,
  * the no-positive NULL, conservation, and partitioning invariance. */
class GainsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gains(rows: Seq[(Long, Long)], b: Int = 10, parts: Int = 1) =
    Classify.gainsTable(rows.toDF("score", "y").repartition(parts),
        "score", "y", b)
      .orderBy($"decile")
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq

  test("a perfect ranker captures all positives in the top buckets") {
    // scores 100..81 are the 20 positives of 100 rows; 5 buckets
    val rows = (1L to 100L).map(i => (i, if (i > 80) 1L else -1L))
    val got = gains(rows, b = 5)
    // bucket 0 = top 20 rows (scores 100..81) = all positives
    assert(got.head == ((0L, 20L, 20L, 20L, 20L, 1000000L, Some(5d))))
    // every later bucket adds no positives; capture stays 1e6
    assert(got.tail.forall(r => r._3 == 0L && r._6 == 1000000L))
    // the last bucket's lift is exactly 1
    assert(got.last._7.contains(1d))
  }

  test("bucket row counts conserve and cumulative counts are monotone") {
    val rows = (1L to 97L).map(i => ((i * 13) % 31, if (i % 3 == 0) 1L else -1L))
    val got = gains(rows)
    assert(got.map(_._2).sum == 97L)
    assert(got.map(_._4) == got.map(_._4).sorted)
    assert(got.last._4 == 97L && got.last._6 == 1000000L)
  }

  test("no positives gives NULL lift and zero capture") {
    val got = gains((1L to 30L).map(i => (i, -1L)), b = 3)
    assert(got.forall(r => r._7.isEmpty && r._6 == 0L))
  }

  test("heavy score ties inflate their decile and the counts show it") {
    // one score with 8 rows among 10 → the tied group lands whole
    val rows = Seq.fill(8)((5L, 1L)) ++ Seq((9L, -1L), (1L, -1L))
    val got = gains(rows, b = 2)
    assert(got.map(_._2).sum == 10L)
    assert(got.exists(_._2 >= 8L))
  }

  test("continuous double scores: conservation holds and no corpus-wide window") {
    import org.apache.spark.sql.functions._
    // 50k distinct doubles — the corpus-sized distinct-score frame
    val scored = spark.range(50000).select(
      (xxhash64(col("id")).cast("double") / 1e18).as("score"),
      when(pmod(col("id"), lit(4)) === 0, 1L).otherwise(0L).as("y"))
    val t = Classify.gainsTable(scored, "score", "y", 10)
      .orderBy(col("decile"))
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(t.map(_._2).sum == 50000L, "row conservation")
    assert(t.map(_._3).sum == 12500L, "positive conservation")
    assert(t.last._4 == 50000L && t.last._5 == 12500L, "cumulative tail")
    assert(t.map(_._2).forall(n => n > 4000 && n < 6000),
      s"deciles stay near-equi-depth on distinct scores: ${t.map(_._2)}")
    val p = Classify.gainsTable(scored, "score", "y", 10)
      .queryExecution.executedPlan.toString
    // the only windows over the score frame are bucket-partitioned;
    // decile-keyed windows ride the 10-row frame
    assert("windowspecdefinition\\((?!__|decile)".r.findFirstIn(p).isEmpty, p)
    assert("windowspecdefinition\\(__b#\\d+[^,]*, s#".r.findFirstIn(p).nonEmpty, p)
  }

  test("partitioning invariance") {
    val rows = (1L to 400L).map(i => ((i * 37) % 91, if (i % 4 == 0) 1L else -1L))
    assert(gains(rows, parts = 1) == gains(rows, parts = 13))
  }
}
