package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: the k (sortKey, payload) pairs with the smallest
  * (sortKey, payload) per group, map-side combinable — the long-keyed
  * sibling of [[SmallestK]] for distance-ranked retrieval.
  *
  * "Top-k neighbors per query" as `ROW_NUMBER() OVER (PARTITION BY qid
  * ORDER BY dist)` sends EVERY scored candidate of a query through one
  * task — at 100 TB a brute/ADC scan scores the whole corpus per
  * query, so that window is a corpus sort. This aggregator keeps a
  * k-bounded buffer through partial aggregation: the shuffle carries
  * at most k pairs per group per map task, and the merge is k-bounded
  * regardless of how many candidates were scored. Ties break on the
  * payload (the candidate id), matching the `(dist, cid)` window
  * order the oracles replay.
  */
class MinKByLong(k: Int) extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: List[(Long, Long)] = Nil

  private def trim(l: List[(Long, Long)]): List[(Long, Long)] =
    l.sorted.take(k)

  // the buffer is kept sorted ascending (zero/trim invariant), so a
  // full buffer rejects a non-improving candidate with one comparison
  // against its last element — this aggregator is the inner loop of
  // every compressed-domain scan (one reduce per scored candidate per
  // query), and the unconditional sort-per-row dominated its profile
  override def reduce(b: List[(Long, Long)], a: (Long, Long)): List[(Long, Long)] =
    if (b.lengthCompare(k) >= 0 && Ordering[(Long, Long)].gteq(a, b.last)) b
    else trim(a :: b)

  override def merge(b1: List[(Long, Long)], b2: List[(Long, Long)]): List[(Long, Long)] =
    trim(b1 ::: b2)

  override def finish(r: List[(Long, Long)]): Seq[(Long, Long)] = r.sorted

  // product ExpressionEncoders, not kryo — see SmallestK: kryo buffers
  // break when ObjectHashAggregate falls back to sort-based
  // aggregation at realistic group counts
  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
