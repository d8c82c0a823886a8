package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** RFM scoring (SURVEY.md §2 row 225): exact cents, monotone scores,
  * ties share a score (the NTILE contrast), the uniform quintile
  * split, and partitioning invariance. */
class RfmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rfm(rows: Seq[(Long, Long, Double)], parts: Int = 1) =
    Analytics.rfmScores(
        rows.map { case (u, min, v) =>
          (u, new Timestamp(1700000000000L + min * 60000L), v) }
          .toDF("user_id", "ts", "value").repartition(parts),
        col("user_id"), col("ts"), col("value"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("monetary totals are exact cents") {
    val got = rfm(Seq((1L, 0L, 0.1), (1L, 1L, 0.2)))
    assert(got.head._4 == 30L)
  }

  test("uniform users split into the full 1..5 score range, monotone") {
    // 10 users, user u has u events, spend u·1.00, last event at minute u
    val rows = (1L to 10L).flatMap(u => (1L to u).map(j => (u, u, 1.0)))
    val got = rfm(rows)
    assert(got.map(_._5) == got.map(_._5).sorted) // recency monotone in u
    assert(got.map(_._6) == got.map(_._6).sorted) // frequency monotone
    assert(got.map(_._6).distinct == Seq(1L, 2L, 3L, 4L, 5L))
    // freq == monetary here (1.00 each) → identical scores
    assert(got.map(_._6) == got.map(_._7))
  }

  test("tied values share a score — never split like NTILE") {
    val rows = (1L to 8L).map(u => (u, u, 5.0)) // all spend 5.00 once
    val got = rfm(rows)
    assert(got.map(_._7).distinct.size == 1)
    assert(got.map(_._6).distinct.size == 1)
  }

  test("partitioning invariance") {
    val rows = (1L to 500L).map(i => (i % 23, i % 97, (i % 7) + 0.25))
    assert(rfm(rows, parts = 1) == rfm(rows, parts = 13))
  }

  test("50k users: exact vs the single-window form, and no corpus-wide window") {
    import org.apache.spark.sql.expressions.Window
    // 50k users with hash-derived near-distinct metrics — the shape
    // whose distinct-value frame used to ride ONE unpartitioned window
    val events = spark.range(50000).select(
      col("id").as("user_id"),
      timestamp_micros(lit(1700000000000000L) +
        pmod(xxhash64(col("id")), lit(1000000L)) * 1000000L).as("ts"),
      (pmod(xxhash64(col("id"), lit(7)), lit(100000L)).cast("double") / 100.0)
        .as("value"))
    val got = Analytics.rfmScores(events, col("user_id"), col("ts"), col("value"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet

    // reference: the plain single-window quantile rule, computed inline
    val users = events.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        (sum(col("value").cast("decimal(12,2)")) * 100).cast("long")
          .as("monetary_cents"))
    def ref(metric: String, out: String)(df: org.apache.spark.sql.DataFrame) = {
      val cum = df.groupBy(col(metric).as("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(
          Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)))
      val tot = cum.agg(sum(col("__c")).as("__n"))
      val m = cum.crossJoin(broadcast(tot))
        .select(col("__v").as(metric),
          (expr("((__cum - 1) * 5) DIV __n") + 1L).as(out))
      df.join(m, Seq(metric))
    }
    val want = Seq(("last_us", "r_score"), ("freq", "f_score"),
      ("monetary_cents", "m_score"))
      .foldLeft(users) { case (df, (m, o)) => ref(m, o)(df) }
      .select(col("user_id"), col("last_us"), col("freq"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)

    // plan pin: every window key is engine-internal — the distinct-
    // value cumsum is partitioned by the __b cell
    val p = Analytics.rfmScores(events, col("user_id"), col("ts"), col("value"))
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\((?!__)".r.findFirstIn(p).isEmpty, p)
    assert("windowspecdefinition\\(__b#\\d+[^,]*, __v#".r.findFirstIn(p).nonEmpty, p)
  }
}
