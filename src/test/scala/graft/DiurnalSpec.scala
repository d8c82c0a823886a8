package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Diurnal concentration (SURVEY.md §2 row 229): hand-computed
  * peak/trough/concentration, the cron-vs-spread separation, both
  * tie-breaks, type isolation, and partitioning invariance. */
class DiurnalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def at(hour: Int, n: Int) =
    Seq.fill(n)(new Timestamp(1700000000000L / 86400000L * 86400000L +
      hour * 3600000L))

  private def diurnal(rows: Seq[(String, Timestamp)], parts: Int = 1) =
    Analytics.diurnalConcentration(
        rows.toDF("event_type", "ts").repartition(parts),
        col("event_type"), col("ts"))
      .orderBy($"event_type")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed peak, trough and concentration") {
    // hours: 9 → 3 events, 14 → 1 event
    val rows = (at(9, 3) ++ at(14, 1)).map("click" -> _)
    val got = diurnal(rows)
    assert(got == Seq(("click", 4L, 9L, 3L, 14L, 1L, 10L, 16L)))
  }

  test("a cron-like type concentrates; a spread type does not") {
    val cron = at(3, 24).map("cron" -> _)
    val human = (0 until 12).flatMap(h => at(h, 2)).map("human" -> _)
    val got = diurnal(cron ++ human)
    val c = got.find(_._1 == "cron").get
    val h = got.find(_._1 == "human").get
    // effective hours = den/num: cron = 1, human = 12
    assert(c._7 == c._8)
    assert(h._8 / h._7 == 12L)
  }

  test("peak ties break later, trough ties break earlier") {
    val rows = (at(5, 2) ++ at(20, 2)).map("t" -> _)
    val got = diurnal(rows).head
    assert(got._3 == 20L && got._5 == 5L)
  }

  test("types are isolated") {
    val rows = at(1, 3).map("a" -> _) ++ at(22, 1).map("b" -> _)
    val got = diurnal(rows)
    assert(got.map(r => (r._1, r._3)) == Seq("a" -> 1L, "b" -> 22L))
  }

  test("partitioning invariance") {
    val rows = (1 to 400).map(i =>
      (s"t${i % 3}", new Timestamp(1700000000000L + i * 977L * 60000L)))
    assert(diurnal(rows, parts = 1) == diurnal(rows, parts = 13))
  }
}
