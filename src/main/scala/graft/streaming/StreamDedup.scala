package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup with an event-time TTL horizon (SURVEY.md §2
  * row 216) — the ingest-side twin of the batch exact-dedup rows
  * 34/35: an unbounded document stream keeps only each content hash's
  * FIRST occurrence, with per-hash state that EXPIRES once the
  * watermark passes last_seen + TTL, so state stays bounded by the
  * dedup horizon's distinct-hash count, not the stream's lifetime.
  * Built on `flatMapGroupsWithState` + EventTimeTimeout (NOT
  * ProcessingTimeTimeout: with processing-time timeouts the
  * micro-batch engine schedules batches continuously to poll timers —
  * a livelock under `processAllAvailable` and wasted triggers in
  * production; event-time timers fire only when the watermark
  * advances, which is also the semantically right horizon — "no
  * duplicates within any TTL window of EVENT time", the crawl-recrawl
  * contract where a page re-fetched months later is a legitimate new
  * observation).
  *
  * Semantics: per content hash the first (ts, id) wins — within a
  * micro-batch the smallest (ts_us, doc_id), deterministic under
  * batch-internal reordering; later arrivals emit nothing while the
  * state lives and RENEW the horizon (sliding TTL); after expiry the
  * next arrival is first again.
  *
  * Scale shape: the keyed frame carries (hash, id, ts) only — text
  * never enters state or shuffle; the stream shuffles once on hash,
  * co-partitioning with any downstream per-hash state. */
object StreamDedup {

  final case class Doc(h: Long, doc_id: Long, ts: java.sql.Timestamp)
  final case class Seen(doc_id: Long, last_us: Long)
  final case class FirstSeen(h: Long, doc_id: Long)

  /** First occurrence per hash within a sliding event-time TTL.
    * `docs` needs (h long, doc_id long, ts timestamp). */
  def dedupFirst(docs: DataFrame, ttlMinutes: Int,
                 watermarkDelay: String = "10 minutes"): Dataset[FirstSeen] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("h").cast("long"), col("doc_id").cast("long"), col("ts"))
      .as[Doc]
      .groupByKey(_.h)
      .flatMapGroupsWithState[Seen, FirstSeen](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (h: Long, it: Iterator[Doc], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = it
              .map(d => (DateTimeUtils.fromJavaTimestamp(d.ts), d.doc_id)).toSeq
            val firstArrival = arrivals.min
            val lastUs = arrivals.map(_._1).max
            val out = state.getOption match {
              case Some(_) => Iterator.empty[FirstSeen] // duplicate: renew only
              case None    => Iterator.single(FirstSeen(h, firstArrival._2))
            }
            val seen = state.getOption.getOrElse(Seen(firstArrival._2, 0L))
            state.update(seen.copy(last_us = math.max(seen.last_us, lastUs)))
            val fireAtMs = math.max(seen.last_us, lastUs) / 1000 +
              ttlMinutes.toLong * 60000
            state.setTimeoutTimestamp(
              math.max(fireAtMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }
}
