package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector second-moment accumulator (SURVEY.md §4 preference (b)) —
  * the sufficient statistics for covariance/PCA over an integer
  * (quantized) vector column in ONE constant-buffer aggregate: the
  * upper triangle of Σ x xᵀ (dim·(dim+1)/2 longs), the first moments
  * Σ x (dim longs), and the row count, packed into one Array[Long].
  * The CountMinAgg/BitsetAgg posture: every map task ships one
  * O(dim²) buffer regardless of corpus size, partials merge by
  * elementwise addition (associative + commutative → batches form a
  * delta state), and the arithmetic is pure long adds/multiplies, so
  * DuckDB replays the result exactly.
  *
  * Buffer layout, row-major over the upper triangle:
  * [P(0,0), P(0,1), …, P(0,d−1), P(1,1), …, P(d−1,d−1),
  *  M(0), …, M(d−1), N] — [[OuterProductAgg.entryIndex]] is the one
  * place that maps (i, j) to its slot; rows whose vector is NULL or
  * has the wrong length are SKIPPED (counted by neither N nor the
  * moments — a malformed vector must not half-contribute).
  *
  * OVERFLOW CONTRACT: |x_i| · |x_j| · rows must stay under 2^63 —
  * with quantization scale s and unit-ish embeddings that is
  * s² · rows < 9.2e18 (s = 1e3 holds past 1e12 rows; callers with
  * heavier values pre-scale down).
  */
case class OuterProductAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, s"dim must be positive, got $dim")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_outer_product"

  private val bufLen = dim * (dim + 1) / 2 + dim + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return buf
    val x = arr.toLongArray()
    var k = 0
    var i = 0
    while (i < dim) {
      val xi = x(i)
      var j = i
      while (j < dim) { buf(k) += xi * x(j); j += 1; k += 1 }
      i += 1
    }
    i = 0
    while (i < dim) { buf(k) += x(i); i += 1; k += 1 }
    buf(k) += 1L
    buf
  }

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
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): OuterProductAgg =
    copy(child = newChildren.head)
}

object OuterProductAgg {

  /** The packed statistics as an aggregate column (array<long>). */
  def outer_product(c: Column, dim: Int): Column =
    ColumnBridge.column(
      OuterProductAgg(ColumnBridge.expression(c), dim).toAggregateExpression())

  /** Flat buffer slot of entry (i, j): products at the (i ≤ j) upper
    * triangle, first moments at j == dim, the count at (dim, dim). */
  def entryIndex(i: Int, j: Int, dim: Int): Int = {
    require(i >= 0 && i <= dim && j >= i && j <= dim, s"bad entry ($i,$j) for dim $dim")
    if (i == dim && j == dim) dim * (dim + 1) / 2 + dim
    else if (j == dim) dim * (dim + 1) / 2 + i
    else i * dim - i * (i - 1) / 2 + (j - i)
  }
}
