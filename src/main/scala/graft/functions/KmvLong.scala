package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: the k smallest DISTINCT longs per group — the
  * KMV (bottom-k) distinct sketch kernel (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007). Unlike [[MinKByLong]] (which ranks a
  * multiset), the buffer is a sorted distinct set, so the aggregation
  * IS the distinct: no distinct-shuffle ever runs — the shuffle
  * carries at most k values per map task and the merge is k-bounded
  * regardless of corpus size. Deterministic by construction (bottom-k
  * of a fixed hash), so two sketches of the same corpus are identical
  * and sketch ALGEBRA (union = merge, the corpus-overlap estimators)
  * is replayable SQL.
  */
class KmvLong(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: List[Long] = Nil

  // sorted-distinct invariant: a full buffer rejects a non-improving
  // value with one comparison against its last element
  override def reduce(b: List[Long], a: Long): List[Long] =
    if (b.lengthCompare(k) >= 0 && a >= b.last) b
    else if (b.contains(a)) b
    else (a :: b).sorted.take(k)

  override def merge(b1: List[Long], b2: List[Long]): List[Long] =
    (b1 ::: b2).distinct.sorted.take(k)

  override def finish(r: List[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
