package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cep

/** MATCH_RECOGNIZE-lite session pattern matching (§2 row 152). */
class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  // pre-sessionized frame: (event_id, user_id, sess_id, ts, event_type)
  private def sess(rows: (Long, Long, Long, Long, String)*) =
    rows.map { case (e, u, s, m, t) => (e, u, s, ts(m), t) }
      .toDF("event_id", "user_id", "sess_id", "ts", "event_type")

  test("earliest in-order chain is selected, not any chain") {
    // A@0, B@1 (before second A — still valid: B after first A),
    // A@2, C@3: match must anchor at A@0, B@1, C@3
    val got = Cep.firstMatch(sess(
      (1L, 1L, 1L, 0L, "a"), (2L, 1L, 1L, 1L, "b"),
      (3L, 1L, 1L, 2L, "a"), (4L, 1L, 1L, 3L, "c")),
      Seq("a", "b", "c"), Seq("user_id", "sess_id")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("id_0") == 1L && r.getAs[Long]("id_1") == 2L &&
      r.getAs[Long]("id_2") == 4L)
    assert(r.getAs[Long]("latency_us") == 3L * 60000000L)
  }

  test("stages must be strictly after the previous match") {
    // b at the same ts as a does NOT count; the later b does
    val got = Cep.firstMatch(sess(
      (1L, 1L, 1L, 0L, "a"), (2L, 1L, 1L, 0L, "b"), (3L, 1L, 1L, 5L, "b")),
      Seq("a", "b"), Seq("user_id", "sess_id")).collect()
    assert(got.length == 1 && got.head.getAs[Long]("id_1") == 3L)
    // out-of-order only -> no match
    assert(Cep.firstMatch(sess(
      (1L, 1L, 1L, 0L, "b"), (2L, 1L, 1L, 1L, "a")), Seq("a", "b"), Seq("user_id", "sess_id")).isEmpty)
  }

  test("ties at the matched timestamp break on event_id") {
    val got = Cep.firstMatch(sess(
      (9L, 1L, 1L, 0L, "a"), (4L, 1L, 1L, 0L, "a"), (7L, 1L, 1L, 1L, "b")),
      Seq("a", "b"), Seq("user_id", "sess_id")).collect()
    assert(got.head.getAs[Long]("id_0") == 4L)
  }

  test("sessions are independent match scopes") {
    val got = Cep.firstMatch(sess(
      (1L, 1L, 1L, 0L, "a"),              // session 1: a only
      (2L, 1L, 2L, 60L, "b"),             // session 2: b only -> no cross-session match
      (3L, 2L, 1L, 0L, "a"), (4L, 2L, 1L, 1L, "b")),
      Seq("a", "b"), Seq("user_id", "sess_id")).collect()
    assert(got.length == 1 && got.head.getAs[Long]("user_id") == 2L)
  }

  test("the whole match pipeline runs on a single exchange") {
    val plan = Cep.patternMatchQ(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one user_id exchange feeds every stage window and the per-user
    // collapse; the final orderBy adds its range exchange only
    assert(n == 1, s"expected one hash exchange:\n$plan")
  }

  test("registered query matches are internally consistent") {
    val got = Cep.patternMatchQ(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("ts_0") < r.getAs[Long]("ts_1"))
      assert(r.getAs[Long]("ts_1") < r.getAs[Long]("ts_2"))
      assert(r.getAs[Long]("latency_us") ==
        r.getAs[Long]("ts_2") - r.getAs[Long]("ts_0"))
    }
  }
}
