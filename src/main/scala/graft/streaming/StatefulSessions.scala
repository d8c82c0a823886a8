package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` (SURVEY.md §2.3#47 — the stateful-stream
  * member of the streaming surface; the batch twin is
  * Relational.sessionize).
  *
  * State per user = the one open session; a closed session is emitted
  * as soon as a later event proves the gap. State size is O(users),
  * independent of stream length — the property that matters on an
  * unbounded stream.
  */
object StatefulSessions {

  final case class SessionEvent(user_id: Long, ts_us: Long, value: Double)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                              n_events: Long, total_value: Double)

  def gapMicros(gapMinutes: Int): Long = gapMinutes.toLong * 60 * 1000000

  /** Fold a user's in-batch events (sorted by time) into the open
    * session, emitting every session a gap closes. Shared by the
    * streaming operator and direct unit tests. */
  def step(openOpt: Option[OpenSession], events: Seq[SessionEvent], gapUs: Long)
      : (Seq[(OpenSession, Long)], Option[OpenSession]) = {
    var open = openOpt
    val closed = Seq.newBuilder[(OpenSession, Long)]
    events.sortBy(_.ts_us).foreach { e =>
      open = open match {
        case None => Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        case Some(o) if e.ts_us - o.last_us > gapUs =>
          closed += ((o, o.last_us))
          Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        case Some(o) =>
          // max: a late (out-of-order) event from a later micro-batch
          // must not rewind last_us — that would arm the flush timeout
          // early and emit an inverted session interval
          Some(o.copy(last_us = math.max(o.last_us, e.ts_us),
            n = o.n + 1, sum = o.sum + e.value))
      }
    }
    (closed.result(), open)
  }

  /** Gap-proof-driven variant: a session is emitted when a LATER event
    * of the same user proves the gap. A user's final session stays open
    * in state forever — use [[sessionizeWithFlush]] on real streams. */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMicros(gapMinutes)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val (closed, open) = step(state.getOption, it.toSeq, gapUs)
          open match {
            case Some(o) => state.update(o)
            case None => ()
          }
          closed.iterator.map { case (o, end) =>
            SessionOut(user, o.start_us, end, o.n, o.sum)
          }
      }
  }

  /** Timestamped event for the watermarked variant. */
  final case class TsEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Production variant: event-time timeout flushes a user's open
    * session once the watermark passes last_event + gap, so the FINAL
    * session of a churned user is emitted too (the NoTimeout variant
    * holds it forever). Input needs (user_id, ts timestamp, value). */
  def sessionizeWithFlush(events: DataFrame, gapMinutes: Int,
                          watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMicros(gapMinutes)
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[TsEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val o = state.get
            state.remove()
            Iterator.single(SessionOut(user, o.start_us, o.last_us, o.n, o.sum))
          } else {
            // DateTimeUtils keeps full microsecond precision (getTime
            // truncates to ms) — gap arithmetic matches the batch path
            val evs = it.map(e =>
              SessionEvent(e.user_id, DateTimeUtils.fromJavaTimestamp(e.ts), e.value)).toSeq
            val (closed, open) = step(state.getOption, evs, gapUs)
            open.foreach { o =>
              state.update(o)
              // fire once the watermark passes the gap horizon (must be
              // strictly beyond the current watermark)
              val fireAtMs = o.last_us / 1000 + gapMinutes.toLong * 60000
              state.setTimeoutTimestamp(math.max(fireAtMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map { case (o, end) =>
              SessionOut(user, o.start_us, end, o.n, o.sum)
            }
          }
      }
  }
}
