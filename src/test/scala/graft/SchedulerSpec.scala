package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CronSpec, Runner}

/** Orchestration layer (SURVEY.md §2 row 259): cron-subset parsing
  * and firing, catch-up window computation, retry/ledger semantics,
  * idempotence, the manual-clear posture for exhausted windows, and
  * the liveness report. Everything runs on explicit times — no wall
  * clock anywhere. */
class SchedulerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(s: String) = LocalDateTime.parse(s)

  test("the reference's daily schedule fires once per day at 04:00") {
    val c = CronSpec.parse("0 4 * * *")
    val f = c.firings(t("2026-08-01T00:00"), t("2026-08-04T12:00"))
    assert(f.map(_.toString) ==
      Seq("2026-08-01T04:00", "2026-08-02T04:00", "2026-08-03T04:00", "2026-08-04T04:00"))
  }

  test("steps, lists, ranges, dow; from is exclusive") {
    val q = CronSpec.parse("*/15 * * * *")
    assert(q.firings(t("2026-08-01T10:00"), t("2026-08-01T11:00"))
      .map(_.getMinute) == Seq(15, 30, 45, 0))
    val lst = CronSpec.parse("0 9,17 * * 1-5") // weekdays 9 and 17
    val f = lst.firings(t("2026-08-07T00:00"), t("2026-08-10T23:59")) // Fri..Mon
    assert(f.map(_.toString) ==
      Seq("2026-08-07T09:00", "2026-08-07T17:00", "2026-08-10T09:00", "2026-08-10T17:00"))
    // dow 7 == Sunday == 0
    assert(CronSpec.parse("0 0 * * 7").matches(t("2026-08-09T00:00"))) // a Sunday
  }

  test("POSIX union rule: restricted dom OR restricted dow") {
    val c = CronSpec.parse("0 0 15 * 1") // the 15th OR any Monday
    assert(c.matches(t("2026-08-15T00:00")))  // Saturday the 15th
    assert(c.matches(t("2026-08-10T00:00")))  // Monday the 10th
    assert(!c.matches(t("2026-08-11T00:00"))) // Tuesday the 11th
  }

  test("catch-up + retries + idempotence + manual-clear posture") {
    val root = java.nio.file.Files.createTempDirectory("graft_sched").toString
    val failures = scala.collection.mutable.Map[String, Int]()
    def flaky(failFirst: Set[String])(w: String): Unit = {
      val n = failures.getOrElse(w, 0)
      if (failFirst.contains(w) && n == 0) {
        failures(w) = n + 1
        throw new RuntimeException(s"transient $w")
      }
      if (w.contains("03T04")) throw new RuntimeException("permanently broken")
    }
    // three days due; day 1 flakes once then succeeds, day 3 always fails
    val r1 = Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-03T12:00"), maxRetries = 1)(
      flaky(Set("2026-08-01T04:00:00")))
    assert(r1.map(r => (r.window, r.attempts, r.status)) == Seq(
      ("2026-08-01T04:00:00", 2, "success"),
      ("2026-08-02T04:00:00", 1, "success"),
      ("2026-08-03T04:00:00", 2, "failed")))

    // same now again: succeeded windows are idempotent, the exhausted
    // window stays failed (manual-clear posture)
    val r2 = Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-03T12:00"), maxRetries = 1)(_ => ())
    assert(r2.isEmpty)

    // retryFailed reruns ONLY the exhausted window, and it heals
    val r3 = Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-03T12:00"), maxRetries = 1,
      retryFailed = true)(_ => ())
    assert(r3.map(r => (r.window, r.status)) == Seq(("2026-08-03T04:00:00", "success")))

    // the ledger carries the full attempt history with error text
    val ledger = Runner.readLedger(spark, root)
      .orderBy(org.apache.spark.sql.functions.col("seq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(ledger.count(_._3 == "retrying") == 2) // day-1 flake + day-3 first try
    assert(ledger.count(_._3 == "failed") == 1)
    assert(ledger.count(_._3 == "success") == 3)
  }

  test("a window interrupted mid-retry resumes; only terminal failures need clearing") {
    val root = java.nio.file.Files.createTempDirectory("graft_sched3").toString
    // simulate a crash between attempts: one 'retrying' ledger row,
    // NO terminal row for the window
    import spark.implicits._
    Seq(("2026-08-01T04:00:00", 1L, "retrying", "transient", 0L))
      .toDF("window", "attempt", "status", "error", "seq")
      .write.mode("append").parquet(s"$root/ledger")
    val r = Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-01T12:00"), maxRetries = 1)(_ => ())
    assert(r.map(x => (x.window, x.status)) ==
      Seq(("2026-08-01T04:00:00", "success")))
  }

  test("staged DAG: mid-DAG failure stops the window and resumes at the failed stage") {
    val root = java.nio.file.Files.createTempDirectory("graft_dag").toString
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    var transformBroken = true
    def stage(n: String)(w: String): Unit = {
      ran += s"$n:$w"
      if (n == "transform" && transformBroken) throw new RuntimeException("boom")
    }
    val stages = Seq[(String, String => Unit)](
      "extract" -> stage("extract"), "transform" -> stage("transform"),
      "load" -> stage("load"))

    // one due window; transform exhausts (1 + 1 retries), load never runs
    val r1 = Runner.runDueStages(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-01T12:00"), maxRetries = 1)(stages)
    assert(r1.map(s => (s.stage, s.attempts, s.status)) == Seq(
      ("extract", 1, "success"), ("transform", 2, "failed")))
    assert(!ran.exists(_.startsWith("load")))

    // exhausted: not due without retryFailed (manual-clear posture)
    assert(Runner.runDueStages(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-01T12:00"), maxRetries = 1)(stages).isEmpty)

    // healed + retryFailed: resumes AT transform — extract is not re-run
    transformBroken = false
    ran.clear()
    val r2 = Runner.runDueStages(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-01T12:00"), maxRetries = 1,
      retryFailed = true)(stages)
    assert(r2.map(s => (s.stage, s.status)) == Seq(
      ("transform", "success"), ("load", "success")))
    assert(!ran.exists(_.startsWith("extract")))

    // now fully succeeded: idempotent no-op
    assert(Runner.runDueStages(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-01T12:00"), maxRetries = 1,
      retryFailed = true)(stages).isEmpty)

    // the ledger carries stage-keyed rows; extract succeeded exactly once
    val ledger = Runner.readLedger(spark, root).collect()
      .map(r => (r.getString(5), r.getString(2)))
    assert(ledger.count(_ == ("extract", "success")) == 1)
    assert(ledger.count(_ == ("transform", "failed")) == 1)
    assert(ledger.count(_ == ("load", "success")) == 1)
  }

  test("staged DAG: a crash BETWEEN stages (no terminal row) resumes next invocation") {
    val root = java.nio.file.Files.createTempDirectory("graft_dag2").toString
    // simulate: extract succeeded, then the process died — ledger has
    // only the extract success row for the window
    import spark.implicits._
    Seq(("2026-08-01T04:00:00", 1L, "success", "", 0L, "extract"))
      .toDF("window", "attempt", "status", "error", "seq", "stage")
      .write.mode("append").parquet(s"$root/ledger")
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val stages = Seq[(String, String => Unit)](
      "extract" -> (w => { ran += s"extract:$w"; () }),
      "load" -> (w => { ran += s"load:$w"; () }))
    // a plain re-invocation (NOT retryFailed) picks the window up and
    // runs only the missing stage
    val r = Runner.runDueStages(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-01T12:00"), maxRetries = 1)(stages)
    assert(r.map(s => (s.stage, s.status)) == Seq(("load", "success")))
    assert(ran.toSeq == Seq("load:2026-08-01T04:00:00"))
    // health keys off the FINAL stage
    val hr = Runner.healthReport(spark, root, "0 4 * * *",
        t("2026-07-31T12:00"), t("2026-08-01T12:00"), finalStage = "load")
      .collect().head
    assert(hr.getBoolean(2))
  }

  test("long-lived daemon: multi-day clock, process deaths mid-run, catch-up and dedupe across restarts") {
    // The Composer daemon's contract (oura_dag.py:26 — daily schedule
    // with catchup) as a harness: six "process lifetimes" invoke the
    // SAME runDueStages over a simulated week, two of them dying
    // mid-run with a non-Exception Throwable (a real kill: no ledger
    // row, no cleanup — runDueStages only absorbs Exception). Across
    // restarts every (window, stage) effect must land EXACTLY once,
    // except the stage actually torn by a crash, which may run twice
    // (at-least-once is the contract for torn work; succeeded stages
    // are never re-run).
    class ProcessDeath extends Error("simulated kill -9")
    val root = java.nio.file.Files.createTempDirectory("graft_daemon").toString
    val effects = scala.collection.mutable.Map[(String, String), Int]()
    var crashAt: Option[(String, String, Boolean)] = None // (window, stage, afterEffect)
    def stage(name: String)(w: String): Unit = {
      val beforeHit = crashAt.contains((w, name, false))
      if (beforeHit) { crashAt = None; throw new ProcessDeath }
      effects((w, name)) = effects.getOrElse((w, name), 0) + 1
      if (crashAt.contains((w, name, true))) { crashAt = None; throw new ProcessDeath }
    }
    val stages = Seq("extract" -> stage("extract") _,
      "transform" -> stage("transform") _, "load" -> stage("load") _)
    val since = t("2026-08-01T00:00")
    def invoke(now: String) = Runner.runDueStages(spark, root, "0 4 * * *",
      since, t(now), maxRetries = 1)(stages)
    def win(d: Int) = f"2026-08-$d%02dT04:00:00"

    // lifetime 1 (day 1): clean run
    assert(invoke("2026-08-01T12:00").map(_.status).forall(_ == "success"))
    // lifetime 2 (day 2): dies mid-DAG, AFTER transform's effect ran
    crashAt = Some((win(2), "transform", true))
    intercept[ProcessDeath] { invoke("2026-08-02T12:00") }
    // lifetime 3 (day 3): resumes day 2 at transform (extract deduped), runs day 3
    val r3 = invoke("2026-08-03T12:00")
    assert(r3.map(s => (s.window, s.stage)) == Seq(
      (win(2), "transform"), (win(2), "load"),
      (win(3), "extract"), (win(3), "transform"), (win(3), "load")))
    // lifetime 4 (day 5): the daemon slept through day 4 — catch-up runs BOTH
    val r4 = invoke("2026-08-05T12:00")
    assert(r4.map(_.window).distinct == Seq(win(4), win(5)))
    // lifetime 5 (day 6): dies BETWEEN stages (before transform's effect)
    crashAt = Some((win(6), "transform", false))
    intercept[ProcessDeath] { invoke("2026-08-06T12:00") }
    // lifetime 6 (day 8): resumes day 6, catches up days 7 and 8
    val r6 = invoke("2026-08-08T12:00")
    assert(r6.map(s => (s.window, s.stage)) == Seq(
      (win(6), "transform"), (win(6), "load"),
      (win(7), "extract"), (win(7), "transform"), (win(7), "load"),
      (win(8), "extract"), (win(8), "transform"), (win(8), "load")))

    // nothing due any more; the staged health report is green
    assert(Runner.dueWindows(spark, root, "0 4 * * *", since,
      t("2026-08-08T12:00"), finalStage = "load").isEmpty)
    val h = Runner.healthReport(spark, root, "0 4 * * *", since,
      t("2026-08-08T12:00"), finalStage = "load").collect().head
    assert(h.getBoolean(2) && h.getLong(3) == 0L)

    // exactly-once everywhere except the one torn stage (at-most-twice)
    val expected = (1 to 8).flatMap(d =>
      Seq("extract", "transform", "load").map(s => (win(d), s))).toSet
    assert(effects.keySet == expected)
    assert(effects((win(2), "transform")) == 2) // torn by the mid-run kill
    assert((effects - ((win(2), "transform"))).values.forall(_ == 1))

    // and the staged ledger REFUSES a defaulted finalStage (round-13
    // advice: keying success off the solo stage would re-run everything)
    val e = intercept[IllegalArgumentException] {
      Runner.healthReport(spark, root, "0 4 * * *", since, t("2026-08-08T12:00"))
    }
    assert(e.getMessage.contains("finalStage"))
  }

  test("health report: healthy when the last expected window succeeded") {
    val root = java.nio.file.Files.createTempDirectory("graft_sched2").toString
    Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-02T12:00"))(_ => ())
    val ok = Runner.healthReport(spark, root, "0 4 * * *",
        t("2026-07-31T12:00"), t("2026-08-02T12:00"))
      .collect().head
    assert(ok.getBoolean(2) && ok.getLong(3) == 0L)
    // advance time a day without running: unhealthy, one missed window
    val late = Runner.healthReport(spark, root, "0 4 * * *",
        t("2026-07-31T12:00"), t("2026-08-03T12:00"))
      .collect().head
    assert(!late.getBoolean(2) && late.getLong(3) == 1L)
  }

  test("alert sink: unhealthy evaluations land exactly one alert row each; healthy none") {
    val root = java.nio.file.Files.createTempDirectory("graft_alerts").toString
    Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-02T12:00"))(_ => ())
    def alerts() = Runner.readAlerts(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

    // healthy: no alert, no row (the email_on_failure analog is quiet)
    assert(!Runner.alertIfUnhealthy(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-02T12:00")))
    assert(alerts().isEmpty)

    // a day passes without a run: ONE alert row with the report fields
    assert(Runner.alertIfUnhealthy(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-03T12:00")))
    assert(alerts().toSeq == Seq(("2026-08-03T12:00:00",
      "2026-08-02T04:00:00", "2026-08-03T04:00:00", 1L)))

    // the monitoring loop double-fires at the same instant: no re-page
    assert(!Runner.alertIfUnhealthy(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-03T12:00")))
    assert(alerts().length == 1)

    // still broken a day later: pages keep coming (a second row)
    assert(Runner.alertIfUnhealthy(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-04T12:00")))
    assert(alerts().length == 2 && alerts()(1)._4 == 2L)

    // the DAG heals: healthy evaluations go quiet again
    Runner.runDue(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-04T12:00"))(_ => ())
    assert(!Runner.alertIfUnhealthy(spark, root, "0 4 * * *",
      t("2026-07-31T12:00"), t("2026-08-04T12:00")))
    assert(alerts().length == 2)
  }
}
