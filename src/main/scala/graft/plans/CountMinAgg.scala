package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a native Catalyst aggregate (SURVEY.md §4
  * preference (b)) — the mergeable frequency sketch that answers
  * "how often does ANY key occur" in O(depth·width) memory, the
  * complement of [[SpaceSavingTopK]] (which answers only "which keys
  * are the top-k"). A 100 TB token-frequency probe ships depth·width
  * longs per map task regardless of vocabulary size (the BitsetAgg /
  * SimHashAgg constant-buffer posture), and sketches built on disjoint
  * batches ADD elementwise — the same delta-state property the
  * incremental ingest paths rely on.
  *
  * Rows hash with the domain-prefixed [[PolyHash64]] ("cms<r>|" per
  * row r — the row-123 hash-stream-independence posture), so the probe
  * side can recompute the SAME buckets in plain column space (concat +
  * poly_hash64 + pmod: [[CountMinAgg.estimate]]), and the DuckDB
  * oracle replays insert and probe in HUGEINT — the sketch is fully
  * deterministic, collisions included: estimates are replayable
  * EXACTLY, and `est >= exact` always (min over per-row overcounts).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, s"depth/width must be positive: $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    var r = 0
    while (r < depth) {
      val h = PolyHash64.compute(UTF8String.fromString("cms" + r + "|" + item))
      buf(r * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
      r += 1
    }
    buf
  }

  /** Elementwise sum — the additivity that makes the sketch a delta
    * state: partials merge associatively and batches commute. */
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {

  /** The sketch as an aggregate column: array<long> of depth·width
    * cells, row-major. */
  def count_min(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Point estimate against a sketch column: min over rows of the
    * item's cell — pure column composition (codegen'd), sharing the
    * aggregate's exact hash stream so probe and insert cannot drift. */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { r =>
      element_at(sketch,
        (pmod(PolyHash64.poly_hash64(concat(lit(s"cms$r|"), item)),
          lit(width.toLong)) + (r * width) + 1).cast(IntegerType))
    }: _*)
}
