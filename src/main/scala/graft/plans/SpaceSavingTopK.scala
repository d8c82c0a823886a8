package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a native Catalyst aggregate
  * (SURVEY.md §4 preference (b): TypedImperativeAggregate with a
  * mutable buffer).
  *
  * Returns the `k` most frequent strings with their estimated counts,
  * using at most `capacity` counters per partial buffer — bounded
  * memory regardless of input cardinality, which is what a "top domains
  * over 100 TB of documents" query needs (an exact groupBy-count
  * shuffles every distinct value; this shuffles `capacity` counters per
  * map task). When `capacity` exceeds the true distinct count the
  * sketch degenerates to exact counting — the property the oracle
  * check exploits.
  *
  * Output: array<struct<item string, cnt long>> ordered by
  * (cnt desc, item asc), ties broken deterministically.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))
  override def prettyName: String = "graft_topk_freq"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** SpaceSaving insert: full buffer evicts the current minimum and
    * inherits its count (+1) — the classic overestimate bound. */
  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        // Allocation-free min scan (still O(capacity) per eviction —
        // fine when capacity >> distinct count, the intended regime; a
        // stream-summary structure is the upgrade for truly adversarial
        // cardinality). Deterministic tie-break on the item.
        var minItem: String = null
        var minCnt = Long.MaxValue
        val it = buf.iterator
        while (it.hasNext) {
          val (i, c) = it.next()
          if (c < minCnt || (c == minCnt && (minItem == null || i < minItem))) {
            minItem = i; minCnt = c
          }
        }
        buf.remove(minItem)
        buf.update(item, minCnt + 1)
    }
    buf
  }

  /** Merge keeps the UNION of the partial buffers (bounded by
    * capacity × number of partial buffers, still independent of input
    * cardinality). Truncating here would discard dropped counters'
    * mass and break the never-undercount guarantee update() maintains —
    * a heavy hitter spread across map tasks could vanish. */
  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b2.foreach { case (i, c) => b1.update(i, b1.getOrElse(i, 0L) + c) }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /** Column API: aggregate expression usable in `df.agg(...)`. */
  def topk_freq(c: Column, k: Int, capacity: Int = 4096): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(c), k, capacity)
        .toAggregateExpression())
}
