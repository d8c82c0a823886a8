package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Assembly

/** Session→document assembly (§2 row 151). */
class AssemblySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def events() = Seq(
    // user 1: two sessions (35-min gap between minute 10 and 46)
    (1L, 1L, ts(0), "click", 1.5),
    (2L, 1L, ts(10), "view", 2.0),
    (3L, 1L, ts(46), "click", 0.25),
    // user 2: one session; same-ts tie broken by event_id
    (5L, 2L, ts(0), "b", 1.0),
    (4L, 2L, ts(0), "a", 1.0),
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("documents carry ordered lines; gap rule splits sessions") {
    val got = Assembly.assemble(events(), gapMinutes = 30)
      .select("user_id", "sess_id", "n_events", "doc")
      .as[(Long, Long, Long, String)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, "click|1.50\nview|2.00"),
      (1L, 2L, 1L, "click|0.25"),
      (2L, 1L, 2L, "a|1.00\nb|1.00")))  // event_id 4 before 5 at equal ts
  }

  test("assembly adds no second exchange over the session window") {
    val plan = Assembly.assemble(events()).queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nExchanges == 1, s"expected the single user_id shuffle:\n$plan")
  }

  test("n_chars counts the assembled text exactly") {
    val got = Assembly.assemble(events())
      .select(col("doc"), col("n_chars")).as[(String, Long)].collect()
    got.foreach { case (doc, n) => assert(doc.length.toLong == n) }
  }

  test("registered query is deterministic on the sf tables") {
    def run() = Assembly.assembleQ(spark, TestSpark.sf)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    val a = run()
    assert(a.nonEmpty && a == run())
    // every multi-event doc is newline-joined and line-count-consistent
    a.filter(_._3 > 1).take(20).foreach { case (_, _, n, doc, _) =>
      assert(doc.split("\n", -1).length.toLong == n)
    }
  }
}
