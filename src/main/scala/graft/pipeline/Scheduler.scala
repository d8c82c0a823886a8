package graft.pipeline

import java.time.{DayOfWeek, LocalDateTime}

/** Cron-subset schedule (SURVEY.md §2 row 259) — the deterministic
  * core of the orchestration layer the reference delegates to Cloud
  * Composer (oura_dag.py:26 `schedule_interval='0 4 * * *'`): the
  * five standard fields (minute hour day-of-month month day-of-week),
  * each `*`, a number, a comma list, an inclusive range `a-b`, or a
  * step (asterisk-slash-k). Day-of-week uses cron numbering (0 = Sunday .. 6 =
  * Saturday; 7 accepted as Sunday). The standard day-field rule is
  * honored: when BOTH dom and dow are restricted, a time matches if
  * EITHER does (POSIX cron's surprising union semantics — documented
  * because everyone trips on it).
  *
  * No wall clock anywhere: callers pass explicit times, so every
  * schedule computation is a pure function and the specs replay it
  * exactly. */
final case class CronSpec(minute: Option[Set[Int]], hour: Option[Set[Int]],
                          dom: Option[Set[Int]], month: Option[Set[Int]],
                          dow: Option[Set[Int]]) {

  private def ok(f: Option[Set[Int]], v: Int): Boolean = f.forall(_.contains(v))

  /** Does this spec fire at minute-resolution time `t`? */
  def matches(t: LocalDateTime): Boolean = {
    val dowCron = if (t.getDayOfWeek == DayOfWeek.SUNDAY) 0 else t.getDayOfWeek.getValue
    val dayOk = (dom, dow) match {
      case (Some(_), Some(_)) => ok(dom, t.getDayOfMonth) || ok(dow, dowCron)
      case _ => ok(dom, t.getDayOfMonth) && ok(dow, dowCron)
    }
    ok(minute, t.getMinute) && ok(hour, t.getHour) &&
      ok(month, t.getMonthValue) && dayOk
  }

  /** Firing times in (`from`, `to`] — from EXCLUSIVE so a window
    * already processed at `from` never re-fires. Minute-resolution
    * walk, bounded: a schedule probe over years belongs in math, not
    * a loop. */
  def firings(from: LocalDateTime, to: LocalDateTime): Seq[LocalDateTime] = {
    require(!to.isBefore(from), s"to $to before from $from")
    val minutes = java.time.Duration.between(from, to).toMinutes
    require(minutes <= 1000000L,
      s"refusing a $minutes-minute schedule walk (cap 1e6); narrow the range")
    val f0 = from.withSecond(0).withNano(0)
    Iterator.iterate(f0.plusMinutes(1))(_.plusMinutes(1))
      .takeWhile(!_.isAfter(to)).filter(matches).toSeq
  }
}

object CronSpec {

  private def field(s: String, lo: Int, hi: Int, name: String): Option[Set[Int]] = {
    def one(tok: String): Seq[Int] = tok match {
      case "*" => lo to hi
      case t if t.startsWith("*/") =>
        val k = t.drop(2).toInt
        require(k >= 1, s"cron $name: step must be >= 1 in '$s'")
        (lo to hi).filter(v => (v - lo) % k == 0)
      case t if t.contains("-") =>
        val Array(a, b) = t.split("-", 2)
        a.toInt to b.toInt
      case t => Seq(t.toInt)
    }
    if (s == "*") None
    else {
      val vs = s.split(",").toSeq.flatMap(one)
      // dow 7 is Sunday in both ancient and modern crons
      val norm = if (name == "dow") vs.map(v => if (v == 7) 0 else v) else vs
      norm.foreach(v => require(v >= lo && v <= hi,
        s"cron $name value $v out of [$lo,$hi] in '$s'"))
      Some(norm.toSet)
    }
  }

  /** Parse the five-field form, e.g. the reference's `0 4 * * *`. */
  def parse(expr: String): CronSpec = {
    val fs = expr.trim.split("\\s+")
    require(fs.length == 5, s"cron needs 5 fields, got ${fs.length} in '$expr'")
    CronSpec(
      field(fs(0), 0, 59, "minute"), field(fs(1), 0, 23, "hour"),
      field(fs(2), 1, 31, "dom"), field(fs(3), 1, 12, "month"),
      field(fs(4), 0, 6, "dow"))
  }
}
