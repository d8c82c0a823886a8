package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP (SURVEY.md §2 row 154) — the streaming twin of the
  * batch pattern matcher (row 152, `Cep.firstMatch`), the capability
  * Flink ships as its CEP library: match a K-stage event pattern per
  * user ON AN UNBOUNDED STREAM, with event-time correctness under
  * out-of-order arrival.
  *
  * Out-of-order handling is the part batch doesn't have to think
  * about: a DFA that advances on arrival order would match a@t0 with
  * b@t20 even when b@t15 arrives one micro-batch later. This
  * implementation BUFFERS events in state until the watermark passes
  * them, then feeds the ripe prefix through the DFA in (ts, event_id)
  * order — so the match a DFA sees is identical to what a batch
  * replay of the same event-time order would produce (spec-pinned:
  * the late-but-within-watermark b@t15 wins over the earlier-arrived
  * b@t20).
  *
  * (Rows LATER than the watermark never reach the operator — Spark's
  * stateful late-row filter drops them first, so the buffer handles
  * RIPENING ORDER and Spark handles too-late discard; an event at
  * exactly the watermark is dropped, which is why matches are defined
  * on ts strictly greater than the watermark at arrival.)
  *
  * State per user = (unripe buffer, DFA progress). The buffer is
  * bounded by the watermark delay × the user's event rate — the
  * out-of-orderness horizon, NOT stream length; the DFA is K longs.
  * A per-batch event-time timeout keeps draining ripe events for
  * users that stop receiving new ones, and state is dropped once the
  * buffer is empty and the DFA is at stage 0.
  *
  * Semantics: first match = batch `Cep.firstMatch` (greedy leftmost —
  * an in-event-time-order DFA computes exactly the earliest chain);
  * after each match the DFA resets, giving MATCH_RECOGNIZE's
  * AFTER MATCH SKIP PAST LAST ROW multi-match — the semantics the
  * batch row deliberately stops short of (it needs recursion there,
  * the stream gets it for free from the reset).
  */
object StreamCep {

  final case class CepEvent(user_id: Long, ts_us: Long, event_id: Long,
                            event_type: String)
  /** Stream-side shape: keeps the WATERMARKED `ts` column itself (the
    * event-time-timeout checker requires the watermark column to reach
    * the stateful operator; a projected-away ts fails analysis). */
  final case class TsCepEvent(user_id: Long, ts: java.sql.Timestamp,
                              event_id: Long, event_type: String)
  /** DFA progress: matched (ts, id) per completed stage, in order. */
  final case class Dfa(mts: Seq[Long], mids: Seq[Long])
  final case class CepState(buffer: Seq[CepEvent], dfa: Dfa)
  final case class CepMatch(user_id: Long, ts: Seq[Long], ids: Seq[Long],
                            latency_us: Long)

  /** Run `evs` (MUST be event-time-sorted by the caller) through the
    * DFA; emits a match per pattern completion, resetting after each
    * (skip past last). Pure — shared by the operator and unit tests. */
  def advance(user: Long, dfa: Dfa, evs: Seq[CepEvent],
              stages: IndexedSeq[String]): (Seq[CepMatch], Dfa) = {
    var mts = dfa.mts.toVector
    var mids = dfa.mids.toVector
    val out = Seq.newBuilder[CepMatch]
    evs.foreach { e =>
      val k = mts.length
      if (e.event_type == stages(k) && (k == 0 || e.ts_us > mts.last)) {
        mts :+= e.ts_us
        mids :+= e.event_id
        if (mts.length == stages.length) {
          out += CepMatch(user, mts, mids, mts.last - mts.head)
          mts = Vector.empty
          mids = Vector.empty
        }
      }
    }
    (out.result(), Dfa(mts, mids))
  }

  /** Pattern-match a stream with columns (user_id, ts timestamp,
    * event_id, event_type). Matches emit in event-time order per user
    * as the watermark ripens them. */
  def matchPattern(events: DataFrame, stages: Seq[String],
                   watermarkDelay: String = "10 minutes"): Dataset[CepMatch] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    import events.sparkSession.implicits._
    val stagesV = stages.toIndexedSeq
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"))
      .as[TsCepEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[TsCepEvent], state: GroupState[CepState]) =>
          val prior = state.getOption.getOrElse(CepState(Vector.empty, Dfa(Nil, Nil)))
          val buffer = prior.buffer ++ it.map(e =>
            // full microsecond precision (getTime is ms-resolution; the
            // micros live in getNanos) — keeps ts_us identical to the
            // batch twin's unix_micros so strict-after ordering and
            // watermark ripeness agree on sub-millisecond events
            CepEvent(e.user_id, DateTimeUtils.fromJavaTimestamp(e.ts),
              e.event_id, e.event_type))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (ripe, unripe) = buffer.partition(_.ts_us <= wmUs)
          val (matches, dfa) =
            advance(user, prior.dfa, ripe.sortBy(e => (e.ts_us, e.event_id)), stagesV)
          if (unripe.isEmpty && dfa.mts.isEmpty) state.remove()
          else {
            state.update(CepState(unripe, dfa))
            if (unripe.nonEmpty)
              // keep draining as the watermark advances, even if this
              // user never receives another event
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          matches.iterator
      }
  }
}
