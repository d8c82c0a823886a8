package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix length in Unicode CODE POINTS as a native
  * codegen expression (SURVEY.md §2 row 178) — the kernel of group-
  * level template detection: the LCP of a whole SET of strings equals
  * LCP(min, max) under lexicographic order (every other string sorts
  * between them, so any prefix shared by min and max is shared by
  * all; any longer prefix would contradict one of them being
  * extremal). That identity turns corpus-wide LCP into one
  * associative min/max aggregation plus this O(prefix) scalar —
  * Spark ships no LCP function, hence a §4-(b) custom Expression.
  *
  * Counting unit: CODE POINTS, matching DuckDB's character `length`/
  * `substr` semantics so the oracle replays the count exactly (a
  * byte-level LCP could split a multibyte sequence; a UTF-16-unit LCP
  * would double-count astral-plane characters). Byte fast path: the
  * code-point count only requires decoding the COMMON prefix — bytes
  * are compared first, then the shared byte run is scanned once for
  * UTF-8 continuation bytes (0b10xxxxxx never starts a code point);
  * a partial multibyte match at the divergence is excluded because a
  * continuation byte at the boundary is not a code-point start.
  */
case class LcpLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lcp_len"

  override def nullSafeEval(l: Any, r: Any): Any =
    LcpLen.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.LcpLen.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcpLen =
    copy(left = newLeft, right = newRight)
}

object LcpLen {

  /** Code-point LCP via byte comparison + one continuation-byte scan
    * of the shared run (see class doc). */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val ba = a.getBytes
    val bb = b.getBytes
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n && ba(i) == bb(i)) i += 1
    // back off a partially-matched multibyte sequence: a code point is
    // whole iff the byte AFTER the shared run (in either string, if
    // any) is not a continuation byte of a sequence started inside it
    var end = i
    if (end < ba.length || end < bb.length) {
      val next = if (end < ba.length) ba(end) else bb(end)
      if ((next & 0xC0) == 0x80) {
        // divergence lands mid-sequence; retreat to the sequence start
        while (end > 0 && (ba(end - 1) & 0xC0) == 0x80) end -= 1
        if (end > 0) end -= 1 // the lead byte itself
      }
    }
    var cp = 0L
    var j = 0
    while (j < end) {
      if ((ba(j) & 0xC0) != 0x80) cp += 1
      j += 1
    }
    cp
  }

  def lcp_len(a: Column, b: Column): Column =
    ColumnBridge.column(
      LcpLen(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
