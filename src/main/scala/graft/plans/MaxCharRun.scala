package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest run of one repeated code point, as a native codegen
  * expression (SURVEY.md §2 row 213) — the byte-level spam signal
  * ("aaaaaaaa", "!!!!!!!", "────────") that token-level repetition
  * filters (row 77's n-gram repetition) structurally miss: a
  * character run IS one token, so no n-gram repeats. Key-mash and
  * separator-art detection is a standard pre-tokenization hygiene
  * gate. Spark ships no run-length function and an RE2-based regexp
  * cannot express it (backreferences like `(.)\1*` are unsupported
  * there AND in DuckDB — which is also why the oracle replays runs
  * via boundary positions, not a regex); hence a §4-(b) custom
  * Expression with `doGenCode`.
  *
  * Counting unit: CODE POINTS (the LcpLen convention), so multibyte
  * runs count characters, not bytes, and the DuckDB `substr`-based
  * replay matches exactly. One O(bytes) pass: code-point starts are
  * non-continuation bytes; two code points are equal iff their byte
  * slices are equal (UTF-8 is a prefix code). Empty string → 0;
  * non-empty → ≥ 1. */
case class MaxCharRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_char_run"

  override def nullSafeEval(s: Any): Any =
    MaxCharRun.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MaxCharRun.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxCharRun =
    copy(child = newChild)
}

object MaxCharRun {

  /** Longest identical-code-point run, one pass over the UTF-8 bytes. */
  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return 0L
    var best = 0L
    var run = 0L
    var prevStart = -1
    var prevLen = 0
    var i = 0
    while (i < n) {
      // length of the code point starting at i
      var len = 1
      while (i + len < n && (b(i + len) & 0xC0) == 0x80) len += 1
      val same = prevLen == len && {
        var k = 0
        var eq = true
        while (eq && k < len) { eq = b(prevStart + k) == b(i + k); k += 1 }
        eq
      }
      run = if (same) run + 1 else 1L
      if (run > best) best = run
      prevStart = i
      prevLen = len
      i += len
    }
    best
  }

  def max_char_run(c: Column): Column =
    ColumnBridge.column(MaxCharRun(ColumnBridge.expression(c)))
}
