package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch as a native aggregate (SURVEY §4
  * preference (b)) — the single-pass candidate generator for frequent
  * items over a column whose cardinality is too large to group-by
  * cheaply. Metwally/Agrawal/El Abbadi's algorithm: keep at most
  * `capacity` counters; a hit increments its counter, a miss over
  * capacity evicts the minimum counter and takes `min + 1` (the
  * overestimate that gives the sketch its guarantee).
  *
  * Guarantees used downstream (see `HeavyHitters`):
  * - every stored estimate OVERestimates the true count, so filtering
  *   on `est * k >= total` keeps every item whose true count is
  *   >= total/k — the candidate set is complete;
  * - an item absent from a merged sketch has true count <= total /
  *   capacity (merge unions partials WITHOUT truncation, so per-partial
  *   eviction bounds just add), hence `capacity` a few multiples of `k`
  *   makes false negatives impossible, not merely unlikely.
  *
  * Scale shape: the partial state is O(capacity) regardless of input
  * rows or cardinality — map-side combine ships a few KB per partition
  * where a plain groupBy would shuffle the entire distinct tail.
  * Eviction scans for the minimum (O(capacity)); fine at the few-
  * thousand capacities this is built for — a production heap would
  * only matter past ~100k counters.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingAgg.Buffer] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_space_saving"

  override def dataType: DataType = SpaceSavingAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): SpaceSavingAgg.Buffer =
    new SpaceSavingAgg.Buffer(0L, mutable.HashMap.empty)

  override def update(buf: SpaceSavingAgg.Buffer, input: InternalRow): SpaceSavingAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.total += 1L
      val key = v.asInstanceOf[UTF8String].toString
      buf.counts.get(key) match {
        case Some(c) => buf.counts.update(key, c + 1L)
        case None if buf.counts.size < capacity => buf.counts.update(key, 1L)
        case None =>
          var minK: String = null
          var minV = Long.MaxValue
          buf.counts.foreach { case (k, c) => if (c < minV) { minK = k; minV = c } }
          buf.counts.remove(minK)
          buf.counts.update(key, minV + 1L)
      }
    }
    buf
  }

  /** Union WITHOUT truncation: partial sketches come one per map task,
    * so the merged size is bounded by partitions x capacity — keeping
    * every entry is what turns the per-partial eviction bounds into a
    * provable global completeness bound. */
  override def merge(b1: SpaceSavingAgg.Buffer, b2: SpaceSavingAgg.Buffer): SpaceSavingAgg.Buffer = {
    b1.total += b2.total
    b2.counts.foreach { case (k, c) =>
      b1.counts.update(k, b1.counts.getOrElse(k, 0L) + c)
    }
    b1
  }

  /** struct(total, items sorted by (-est, token) for a deterministic
    * result row). */
  override def eval(buf: SpaceSavingAgg.Buffer): Any = {
    val items = buf.counts.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericInternalRow(Array[Any](
      buf.total,
      new GenericArrayData(items.map { case (k, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
      })))
  }

  override def serialize(buf: SpaceSavingAgg.Buffer): Array[Byte] = {
    val entries = buf.counts.toArray.map { case (k, c) => (k.getBytes(StandardCharsets.UTF_8), c) }
    val size = 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.total)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val total = bb.getLong()
    val n = bb.getInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      m.update(new String(kb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    new SpaceSavingAgg.Buffer(total, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {

  final class Buffer(var total: Long, val counts: mutable.HashMap[String, Long])

  val resultType: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** Column API: `space_saving(tokenCol, capacity)` for `df.agg(...)`. */
  def spaceSaving(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
