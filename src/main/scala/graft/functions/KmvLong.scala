package graft.functions

import org.apache.spark.sql.Encoder
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
  *
  * The buffer is a sorted primitive long array: reject-above-max is
  * one comparison, membership is a binary search, insert is two
  * arraycopies — O(log k + k) per row against the old list buffer's
  * O(k log k) sort per insert (and no per-element boxing), which
  * matters when the sketch runs over raw-token streams rather than
  * pre-hashed ids.
  */
class KmvLong(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  // sorted-distinct invariant: ascending, no duplicates, length <= k
  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    // a full buffer rejects a non-improving value with one comparison
    // (>= also rejects a duplicate of the current max)
    if (b.length >= k && a >= b(b.length - 1)) b
    else {
      val i = java.util.Arrays.binarySearch(b, a)
      if (i >= 0) b // already present
      else {
        val ins = -i - 1
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = a
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  // linear merge of two sorted distinct arrays, truncated at k
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val cap = math.min(x.length + y.length, k)
      val out = new Array[Long](cap)
      var i = 0; var j = 0; var n = 0
      while (n < cap && (i < x.length || j < y.length)) {
        // each side is internally distinct; equal heads consume both
        out(n) =
          if (j >= y.length) { i += 1; x(i - 1) }
          else if (i >= x.length) { j += 1; y(j - 1) }
          else if (x(i) < y(j)) { i += 1; x(i - 1) }
          else if (y(j) < x(i)) { j += 1; y(j - 1) }
          else { i += 1; j += 1; x(i - 1) }
        n += 1
      }
      if (n == cap) out else java.util.Arrays.copyOf(out, n)
    }
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
