package graft.pipeline

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scheduled-run ledger + retry semantics (SURVEY.md §2 row 259) —
  * the engine-side analog of what the reference delegates to Airflow
  * (oura_dag.py:18 `retries=1`, :26 daily schedule, catchup;
  * health_check_dag.py:14 liveness). No Airflow exists in this
  * environment, so the DETERMINISTIC core is built here and the
  * process-level trigger (a cron daemon, a Composer, a k8s CronJob)
  * stays a deploy concern:
  *
  *  - **catch-up**: due windows = the cron's firings in
  *    (lastObservedWindow, now] minus windows already succeeded —
  *    the row-2 watermark idea lifted to the orchestration level;
  *  - **retries**: each window gets up to 1 + maxRetries attempts in
  *    THIS invocation; every attempt lands in the ledger with its
  *    error text; a window that exhausted its attempts stays
  *    `failed` and is NOT silently retried on later invocations
  *    (Airflow's cleared-manually posture) unless `retryFailed`;
  *  - **idempotence**: succeeded windows never re-run — re-invoking
  *    with the same `now` is a no-op;
  *  - **liveness**: [[healthReport]] compares the last success
  *    against the last expected firing — the health-check DAG as a
  *    one-row frame.
  *
  * The ledger is an append-only parquet table under `root/ledger`
  * (window, attempt, status, error, seq) — restart-safe, queryable
  * with the rest of the warehouse, and ordered by an explicit `seq`
  * (max seq + 1 per append; never a wall clock, so replays are
  * bit-stable). Scale: the ledger is runs × attempts — orchestration
  * metadata, not data; one small read + appends per invocation. */
object Runner {

  private val Fmt = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  // `stage` sits LAST: rows written before multi-stage support (and
  // hand-built test fixtures) lack it and read back NULL, which every
  // consumer folds to the single-stage name "task"
  private val ledgerSchema = StructType(Seq(
    StructField("window", StringType),
    StructField("attempt", LongType),
    StructField("status", StringType),
    StructField("error", StringType),
    StructField("seq", LongType),
    StructField("stage", StringType)))

  private def ledgerDir(root: String) = s"$root/ledger"

  def readLedger(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(ledgerSchema).parquet(ledgerDir(root))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], ledgerSchema)
  }

  private def append(spark: SparkSession, root: String, window: String,
                     attempt: Long, status: String, error: String,
                     seq: Long, stage: String): Unit = {
    import spark.implicits._
    Seq((window, attempt, status, error, seq, stage))
      .toDF("window", "attempt", "status", "error", "seq", "stage")
      .write.mode("append").parquet(ledgerDir(root))
  }

  /** The single-stage name legacy ledger rows (stage = NULL) fold to. */
  val SoloStage = "task"

  /** Resolve an omitted `finalStage` (null = the caller took the
    * default) against what the ledger actually contains. The silent
    * failure this kills (round-13 advice): a caller who ran a
    * multi-stage DAG via [[runDueStages]] and later calls
    * [[dueWindows]]/[[healthReport]] WITHOUT `finalStage` would key
    * success off the solo stage name, which no staged row carries —
    * every window reads as never-succeeded, forever due and never
    * healthy, silently re-running completed DAGs. So: defaulting is
    * only legal when the ledger holds solo rows exclusively; a staged
    * ledger demands the stage name (pass `stages.last._1`, or
    * [[SoloStage]] explicitly to assert the solo reading). */
  private def resolveFinalStage(ledger: DataFrame, finalStage: String): String =
    if (finalStage != null) finalStage
    else {
      val foreign = ledger
        .select(coalesce(col("stage"), lit(SoloStage)).as("stage"))
        .filter(col("stage") =!= SoloStage)
        .distinct().collect().map(_.getString(0))
      require(foreign.isEmpty,
        s"this ledger contains multi-stage rows (${foreign.mkString(", ")}); " +
        "pass finalStage explicitly (the last stage name of your DAG) - " +
        "defaulting to the solo stage would treat every completed window " +
        "as never-succeeded and re-run it")
      SoloStage
    }

  /** Windows of `cron` due in (`since`, `now`]: fired, minus already
    * succeeded, minus (unless `retryFailed`) already exhausted. A
    * window counts as succeeded only when its FINAL stage has a
    * success row — mid-DAG progress leaves it due, so a crash between
    * stages resumes. */
  def dueWindows(spark: SparkSession, root: String, cron: String,
                 since: LocalDateTime, now: LocalDateTime,
                 retryFailed: Boolean = false,
                 finalStage: String = null): Seq[String] = {
    val fired = CronSpec.parse(cron).firings(since, now).map(Fmt.format)
    val raw = readLedger(spark, root)
    val fin = resolveFinalStage(raw, finalStage)
    // exhausted = a TERMINAL 'failed' row exists (on ANY stage) — a
    // window whose ledger holds only 'retrying' rows was interrupted
    // mid-retry (a crash between attempts) and must RESUME, not
    // silently enter the manual-clear posture it never earned
    val ledger = raw
      .groupBy(col("window"))
      .agg(max(when(col("status") === "success" &&
          coalesce(col("stage"), lit(SoloStage)) === fin, 1L)
          .otherwise(0L)).as("ok"),
        max(when(col("status") === "failed", 1L).otherwise(0L)).as("exhausted"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1) == 1L, r.getLong(2) == 1L)))
      .toMap
    fired.filter { w =>
      ledger.get(w) match {
        case Some((true, _)) => false           // succeeded: idempotent skip
        case Some((false, true)) => retryFailed // exhausted: manual clear
        case Some((false, false)) => true       // interrupted mid-stage/retry: resume
        case None => true
      }
    }
  }

  final case class RunResult(window: String, attempts: Int, status: String)
  final case class StageResult(window: String, stage: String,
                               attempts: Int, status: String)

  /** Run every due window in order with retry semantics; returns one
    * result per window actually attempted. `task` is the per-window
    * job (typically: extract the window's range, transform, append —
    * the reference's whole DAG body); a thrown exception is one
    * failed attempt. */
  def runDue(spark: SparkSession, root: String, cron: String,
             since: LocalDateTime, now: LocalDateTime,
             maxRetries: Int = 1, retryFailed: Boolean = false)
            (task: String => Unit): Seq[RunResult] =
    runDueStages(spark, root, cron, since, now, maxRetries, retryFailed)(
      Seq(SoloStage -> task))
      .map(sr => RunResult(sr.window, sr.attempts, sr.status))

  /** Multi-stage DAG body (SURVEY.md §2 row 259 extension; reference
    * analog oura_dag.py:33-41 — extract → transform → load as chained
    * Airflow tasks): `stages` run IN ORDER per due window, each stage
    * with its own retry budget and its own stage-keyed ledger rows.
    *
    *  - **resume-from-failed-stage**: a stage that once succeeded for
    *    a window is NEVER re-run — a crash (or terminal failure)
    *    between stages resumes the window at its first non-succeeded
    *    stage, on the next invocation or under `retryFailed`;
    *  - **fail-stops-the-window**: a stage that exhausts its attempts
    *    marks the window failed; later stages do not run (their
    *    inputs don't exist);
    *  - the window is succeeded only when its FINAL stage succeeds,
    *    so `dueWindows` idempotence keys off end-to-end completion.
    *
    * Returns one StageResult per (window, stage) actually ATTEMPTED
    * this invocation (resumed-past stages and stages after a failure
    * are absent). */
  def runDueStages(spark: SparkSession, root: String, cron: String,
                   since: LocalDateTime, now: LocalDateTime,
                   maxRetries: Int = 1, retryFailed: Boolean = false)
                  (stages: Seq[(String, String => Unit)]): Seq[StageResult] = {
    require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")
    require(stages.nonEmpty, "at least one stage required")
    require(stages.map(_._1).distinct.size == stages.size,
      s"stage names must be unique: ${stages.map(_._1)}")
    var seq = readLedger(spark, root)
      .agg(coalesce(max(col("seq")), lit(-1L))).head().getLong(0)
    val due = dueWindows(spark, root, cron, since, now, retryFailed,
      finalStage = stages.last._1)
    if (due.isEmpty) return Seq.empty
    // stages already succeeded per window (the resume set) — one read
    val doneStages: Map[String, Set[String]] = readLedger(spark, root)
      .filter(col("status") === "success")
      .select(col("window"), coalesce(col("stage"), lit(SoloStage)).as("stage"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (w, rs) => w -> rs.map(_.getString(1)).toSet }
    val out = Seq.newBuilder[StageResult]
    due.foreach { w =>
      val already = doneStages.getOrElse(w, Set.empty)
      var windowLive = true
      stages.foreach { case (name, task) =>
        if (windowLive && !already.contains(name)) {
          var attempt = 0
          var done = false
          var status = "failed"
          while (!done && attempt <= maxRetries) {
            attempt += 1
            seq += 1
            try {
              task(w)
              status = "success"; done = true
              append(spark, root, w, attempt.toLong, "success", "", seq, name)
            } catch {
              case e: Exception =>
                val s = if (attempt > maxRetries) "failed" else "retrying"
                append(spark, root, w, attempt.toLong, s,
                  String.valueOf(e.getMessage), seq, name)
            }
          }
          out += StageResult(w, name, attempt, status)
          if (status != "success") windowLive = false // later stages lack inputs
        }
      }
    }
    out.result()
  }

  /** One-row liveness frame: the last succeeded window vs the last
    * firing expected by `now` — `healthy` iff they agree (or nothing
    * was expected yet). The health-check DAG as data. */
  def healthReport(spark: SparkSession, root: String, cron: String,
                   since: LocalDateTime, now: LocalDateTime,
                   finalStage: String = null): DataFrame = {
    import spark.implicits._
    val expected = CronSpec.parse(cron).firings(since, now).map(Fmt.format)
    val lastExpected = expected.lastOption.getOrElse("")
    val raw = readLedger(spark, root)
    val fin = resolveFinalStage(raw, finalStage)
    // only end-to-end completion counts as alive: a staged window
    // that died mid-DAG must not report healthy
    val lastSuccess = raw
      .filter(col("status") === "success" &&
        coalesce(col("stage"), lit(SoloStage)) === fin)
      .agg(max(col("window"))).head().getString(0)
    Seq((Option(lastSuccess).getOrElse(""), lastExpected,
        lastExpected.isEmpty || Option(lastSuccess).contains(lastExpected),
        expected.count(w => Option(lastSuccess).forall(_ < w)).toLong))
      .toDF("last_success", "last_expected", "healthy", "missed_windows")
  }

  // ---- alert channel (round-14 "what's missing" 2) --------------------------

  private val alertSchema = StructType(Seq(
    StructField("evaluated_at", StringType),
    StructField("last_success", StringType),
    StructField("last_expected", StringType),
    StructField("missed_windows", LongType)))

  private def alertsDir(root: String) = s"$root/alerts"

  /** The landed alert log — append-only parquet next to the ledger,
    * queryable with the rest of the warehouse. */
  def readAlerts(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(alertsDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(alertSchema).parquet(alertsDir(root))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], alertSchema)
  }

  /** The `email_on_failure`/`email_on_retry` analog (the reference's
    * DAG default_args, oura_dag.py:16-18): evaluate [[healthReport]]
    * and, when the pipeline is NOT healthy, land exactly ONE alert row
    * for this evaluation instant in the `root/alerts` table (plus a
    * log-channel emission — the sandbox's "email"). Re-evaluating the
    * same `now` is a no-op (the ledger's idempotence posture: a
    * monitoring loop that fires twice must not double-page), a later
    * `now` that is still unhealthy alerts again (pages keep coming
    * until someone fixes the DAG), and a healthy evaluation emits
    * nothing. Returns whether an alert was emitted THIS call. */
  def alertIfUnhealthy(spark: SparkSession, root: String, cron: String,
                       since: LocalDateTime, now: LocalDateTime,
                       finalStage: String = null): Boolean = {
    import spark.implicits._
    val r = healthReport(spark, root, cron, since, now, finalStage).head()
    val (lastSuccess, lastExpected, healthy, missed) =
      (r.getString(0), r.getString(1), r.getBoolean(2), r.getLong(3))
    if (healthy) return false
    val evalAt = Fmt.format(now)
    val already = readAlerts(spark, root)
      .filter(col("evaluated_at") === evalAt).limit(1).count() > 0
    if (already) return false
    Seq((evalAt, lastSuccess, lastExpected, missed))
      .toDF("evaluated_at", "last_success", "last_expected", "missed_windows")
      .write.mode("append").parquet(alertsDir(root))
    System.err.println(s"[graft.health] ALERT at $evalAt: last_success=" +
      s"'$lastSuccess' last_expected='$lastExpected' missed=$missed root=$root")
    true
  }
}
