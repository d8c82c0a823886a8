package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width bitset OR-aggregate: each input row sets one bit of a
  * `mBits`-wide bitmap, partials merge by bitwise OR, and the result is
  * the packed `long[mBits/64]` words (SURVEY.md §4 preference (b) — the
  * [[SimHashAgg]] posture applied to set membership).
  *
  * This is the build side of a Bloom filter whose PROBE DERIVATION
  * lives in plain column space (`Bloom.probe` — `xxhash64(h, i)` mod
  * m): the aggregate itself is hash-agnostic, so insert and membership
  * sides share the probe expressions by construction and cannot drift.
  * OR is commutative/associative ⇒ the bits are independent of row
  * order and partitioning; map-side combine means each task ships one
  * `mBits/8`-byte buffer regardless of input rows — a 2^20-bit filter
  * over a billion shingles shuffles 128 KiB per task, not the shingles.
  *
  * The declarative alternative (`groupBy(word) → bit_or → collect to an
  * array`) shuffles one row per DISTINCT SET BIT and needs a driver
  * collect or a sort-based array assembly; here the whole build is one
  * partial-aggregate pass with a constant-size buffer.
  */
case class BitsetAgg(
    child: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"mBits must be a power of two >= 64, got $mBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bitset"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // callers pass a pre-reduced index in [0, mBits); mask defensively
      // so a contract violation cannot write out of bounds
      val idx = (v.asInstanceOf[Long] & (mBits - 1L)).toInt
      buf(idx >>> 6) |= 1L << (idx & 63)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BitsetAgg {
  /** Aggregate column: bitset of the (pre-reduced) bit indices. */
  def bitset(idx: Column, mBits: Int): Column =
    ColumnBridge.column(
      BitsetAgg(ColumnBridge.expression(idx), mBits)
        .toAggregateExpression())
}
