package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog REGISTERS as a native Catalyst aggregate (SURVEY.md §4
  * preference (b)) — the fully deterministic twin of Spark's
  * `hll_sketch_agg` (q_hll_users, whose Datasketches binary image is
  * engine-specific and therefore rows-only). Here the sketch state
  * itself is the contract: m = 2^p byte registers over the
  * domain-prefixed [[PolyHash64]] stream ("hll|" + item), bucket =
  * low p bits, rho = trailing-zero rank of the remaining 64-p bits
  * (Flajolet–Martin's geometric observable — P(rho ≥ k) = 2^-(k-1),
  * the same distribution the leading-zero form gives, but replayable
  * in portable SQL as `bit_count((w & -w) - 1) + 1`). The DuckDB
  * oracle re-derives every register EXACTLY (q_hll_registers), the
  * CountMinAgg proof pattern applied to distinct-counting.
  *
  * Scale shape (100 TB): constant m-byte buffer per map task
  * regardless of cardinality; partials merge by elementwise MAX —
  * commutative, associative, idempotent — so per-day register rows
  * are a STORED delta state ("distinct users this quarter" = max over
  * 90 register rows, zero raw-event rescans), and re-merging a batch
  * is harmless (idempotence is what the count-sketches can't offer).
  * The float harmonic-mean ESTIMATE stays out of the oracle surface
  * by design ([[HllRegistersAgg.estimate]] is spec-pinned only).
  */
case class HllRegistersAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  require(p >= 2 && p <= 16, s"p (bucket bits) must be in [2,16], got $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  // coerce (or reject) non-string children at analysis time — the
  // update path reads the input as UTF8String, and without a declared
  // input type a long child dies mid-execution with a ClassCastException
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = PolyHash64.compute(
      UTF8String.fromString("hll|" + v.asInstanceOf[UTF8String].toString))
    val bucket = java.lang.Math.floorMod(h, m.toLong).toInt
    val w = h >>> p
    val rho = (if (w == 0L) 64 - p + 1
               else java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
    if (rho > buf(bucket)) buf(bucket) = rho
    buf
  }

  /** Elementwise max — commutative, associative AND idempotent: stored
    * per-batch registers merge in any order, any number of times. */
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllRegistersAgg =
    copy(child = newChildren.head)
}

object HllRegistersAgg {

  /** The register vector as an aggregate column: array<int> of 2^p. */
  def hll_registers(c: Column, p: Int): Column =
    ColumnBridge.column(
      HllRegistersAgg(ColumnBridge.expression(c), p)
        .toAggregateExpression())

  /** Standard HLL estimate from a register column (raw form with the
    * small-range linear-counting correction). Transcendental (ln,
    * harmonic mean) — spec-pinned against exact distinct counts, never
    * on the oracle wire (SURVEY.md §5). */
  def estimate(registers: Column, p: Int): Column = {
    val m = (1 << p).toDouble
    val alpha =
      if (p == 4) 0.673 else if (p == 5) 0.697 else if (p == 6) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val harm = aggregate(registers, lit(0.0),
      (acc, r) => acc + pow(lit(2.0), -r.cast(DoubleType)))
    val zeros = size(filter(registers, _ === 0)).cast(DoubleType)
    val raw = lit(alpha * m * m) / harm
    // linear counting below the 2.5m crossover when empty buckets exist
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m) * log(lit(m) / zeros)).otherwise(raw)
  }
}
