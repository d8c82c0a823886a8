package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: the k (sortKey, value) pairs with the smallest
  * sortKey per group, map-side combinable.
  *
  * This is the scalable form of "ROW_NUMBER() <= k per group": a window
  * formulation sorts every row of the group; this aggregator keeps a
  * k-bounded buffer through partial aggregation, so the shuffle carries
  * at most k rows per group per map task. With sortKey = a content hash
  * (e.g. md5(text)) it is also a deterministic uniform group sample —
  * min-wise sampling — reproducible across cluster sizes and partition
  * layouts, which a random() sample is not.
  */
class SmallestK(k: Int) extends Aggregator[(String, Long), List[(String, Long)], Seq[Long]] {

  override def zero: List[(String, Long)] = Nil

  private def trim(l: List[(String, Long)]): List[(String, Long)] =
    l.sorted.take(k)

  // sorted-ascending buffer invariant (zero/trim): a full buffer
  // rejects a non-improving row with one comparison — see MinKByLong
  override def reduce(b: List[(String, Long)], a: (String, Long)): List[(String, Long)] =
    if (b.lengthCompare(k) >= 0 && Ordering[(String, Long)].gteq(a, b.last)) b
    else trim(a :: b)

  override def merge(b1: List[(String, Long)], b2: List[(String, Long)]): List[(String, Long)] =
    trim(b1 ::: b2)

  override def finish(r: List[(String, Long)]): Seq[Long] = r.sorted.map(_._2)

  // Product ExpressionEncoders, NOT Encoders.kryo: the kryo-encoded
  // buffer survives hash aggregation but breaks the moment
  // ObjectHashAggregate falls back to sort-based aggregation (> 128
  // distinct groups per task) and must serialize in-flight buffers —
  // kryo then meets a HeapByteBuffer it has no serializer for. The
  // fallback only triggers at realistic group counts, which is exactly
  // the 100 TB path; the product encoder serializes List[(String,
  // Long)] natively (and faster).
  override def bufferEncoder: Encoder[List[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
