package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as a single native aggregate (SURVEY.md §4
  * preference (b)): per bit position, the sign of the sum of ±1 votes
  * from each input token hash; the result packs the 64 sign bits into
  * one long.
  *
  * This replaces the declarative formulation of 64 separate
  * `SUM(CASE WHEN …)` columns, whose generated aggregate-update method
  * was enormous (64 independent accumulator slots touched per row) and
  * fell off the JIT cliff unpredictably — the same query benched 2.3s
  * one run and 9.8s the next with unchanged code. Here the update is a
  * compiled 64-iteration loop over a plain long[64] buffer: branch-free
  * (the vote is `2*bit - 1`), allocation-free, and the partial buffer
  * serializes to 512 bytes for map-side combine, so one doc's votes
  * shuffle as one row regardless of token count.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var bit = 0
      while (bit < 64) {
        buf(bit) += (((h >>> bit) & 1L) << 1) - 1L // +1 if bit set, else -1
        bit += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** Sign fold: bit set iff the vote sum is strictly positive (ties →
    * 0, matching the previous `WHEN sum > 0` formulation). */
  override def eval(buf: Array[Long]): Any = {
    var sim = 0L
    var bit = 0
    while (bit < 64) {
      if (buf(bit) > 0L) sim |= (1L << bit)
      bit += 1
    }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: `simhash(tokenHashCol)` for `df.agg(...)`. */
  def simhash(c: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
