package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd array-dot kernels (preference (b) in SURVEY.md §4).
  *
  * Why custom Expressions: Spark's higher-order functions
  * (`aggregate(zip_with(...))`) evaluate their lambdas INTERPRETED —
  * one boxed function call per element per row. That was measured as
  * the dominant cost of every vector query (SURVEY §6). These kernels
  * are a single tight primitive loop over the two ArrayData buffers,
  * inlined into whole-stage codegen; the interpreted path calls the
  * SAME static kernel, so both execution modes agree bit-for-bit.
  *
  * Null semantics mirror the HOF formulation they replace: a null
  * array yields null; arrays of different lengths yield null (zip_with
  * pads with null, which nulls the sum); a null ELEMENT yields null.
  */
abstract class ArrayKernelExpression extends BinaryExpression {
  override def nullable: Boolean = true // element nulls / length mismatch

  /** Required element type of both input arrays. */
  def elementType: DataType

  /** Analysis-time type check: without it, binding e.g. an array<int>
    * column to a long kernel passes analysis and reads garbage through
    * ArrayData.getLong at runtime. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(et, _) => et == elementType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<${elementType.simpleString}> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Fully-qualified static kernel, returning a boxed value or null. */
  def kernel: String
  /** Boxed JVM type of the kernel result. */
  def boxedType: String
  /** JVM primitive accessor on the boxed type. */
  def unbox: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |$boxedType $tmp = $kernel($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.$unbox();
         |}
       """.stripMargin
    })
}

/** Exact dot product of two array<long> columns (quantized vectors). */
case class ArrayDotLong(left: Expression, right: Expression)
    extends ArrayKernelExpression {
  override def dataType: DataType = LongType
  override def elementType: DataType = LongType
  override def prettyName: String = "graft_dot_long"
  override def kernel: String = "graft.plans.VectorKernels.dotLong"
  override def boxedType: String = "java.lang.Long"
  override def unbox: String = "longValue"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two array<double> columns. */
case class ArrayDotDouble(left: Expression, right: Expression)
    extends ArrayKernelExpression {
  override def dataType: DataType = DoubleType
  override def elementType: DataType = DoubleType
  override def prettyName: String = "graft_dot_double"
  override def kernel: String = "graft.plans.VectorKernels.dotDouble"
  override def boxedType: String = "java.lang.Double"
  override def unbox: String = "doubleValue"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotDouble =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two array<double> columns. */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends ArrayKernelExpression {
  override def dataType: DataType = DoubleType
  override def elementType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"
  override def kernel: String = "graft.plans.VectorKernels.l2Sq"
  override def boxedType: String = "java.lang.Double"
  override def unbox: String = "doubleValue"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2Sq =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  /** Boxed so length-mismatch / element-null can surface as SQL NULL
    * (matching the zip_with formulation these kernels replace). */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def l2Sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column APIs. Inputs must already have the right element type —
    * callers cast (casts are codegen'd, this keeps the kernels to one
    * accessor per type). */
  def dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_double(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotDouble(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2_sq(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
