package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step: a single greedy left-to-right pass over a
  * symbol array replacing adjacent (a, b) with a+b (SURVEY.md §2 row
  * 116). The scan never reconsiders a merged token within the same
  * pass — the classic BPE application rule (Sennrich et al. 2016).
  *
  * Why a custom Expression (preference (b) in SURVEY §4): the merge is
  * a stateful adjacent scan, which higher-order functions cannot
  * express without an interpreted lambda per element; this is one
  * O(len) pass with a single output buffer. The merge pair is baked in
  * as constructor constants (merges are driver-known model values, the
  * RollingMinHash `k` pattern), so encoding with a learned table is a
  * CHAIN of these expressions — fully codegen'd, no per-row
  * interpretation anywhere. Codegen calls the same static kernel as
  * the interpreted path (bit-parity pinned in BpeSpec).
  *
  * DuckDB replay: `list_reduce` over singleton-wrapped symbols with a
  * merge-or-append CASE reproduces the greedy pass exactly — the
  * merged token a+b is strictly longer than a, so it can never
  * re-match as the left element of the same pair within the pass (the
  * equivalence the q_bpe_merges oracle rests on).
  */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  require(a.nonEmpty && b.nonEmpty, "merge-pair symbols must be non-empty")

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_bpe_merge_pair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeMergePair.compute(input.asInstanceOf[ArrayData], ua, ub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", ua, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeB", ub, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeMergePair.compute($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

object BpeMergePair {

  /** Greedy adjacent-pair merge; null elements never match and pass
    * through unchanged. */
  def compute(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i + 1 < n && !arr.isNullAt(i + 1) &&
          cur.equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        out(o) = UTF8String.concat(a, b); o += 1; i += 2
      } else {
        out(o) = cur; o += 1; i += 1
      }
    }
    new GenericArrayData(if (o == n) out else java.util.Arrays.copyOf(out, o))
  }

  /** Column API (via the in-package bridge — see ColumnBridge). */
  def bpe_merge_pair(c: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMergePair(ColumnBridge.expression(c), a, b))
}
