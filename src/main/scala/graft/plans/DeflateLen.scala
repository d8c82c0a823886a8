package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the kernel under the
  * compression-ratio quality signal (SURVEY.md §2 row 108): natural
  * prose compresses to ~40–60% while boilerplate, template spam, and
  * repeated n-gram soup collapse far below that, so
  * `n_bytes / deflate_len` separates them with zero linguistic
  * knowledge (the MassiveText/Gopher and RefinedWeb recipe sets
  * thresholds on exactly this ratio).
  *
  * Level is a literal so the expression stays foldable-shaped; the
  * kernel is one static call on the raw UTF-8 bytes (no string copy),
  * identical in interpreted and codegen mode. zlib output for a fixed
  * level is deterministic for a given library build, which is the
  * Spark-side determinism the suite needs (partitioning/retry
  * invariance); it is NOT portable math, so the registered query is
  * rows-only by design — DuckDB carries no zlib surface to replay it
  * (same posture as the HLL/quantile sketches).
  */
case class DeflateLen(child: Expression, level: Int) extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level must be in [1, 9], got $level")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeflateLen.compute($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** One-shot DEFLATE (raw, no zlib header — the 2-byte header would
    * wash out short-string ratios) over the UTF-8 bytes; returns the
    * compressed length only, the payload is discarded.
    *
    * Thread-safety vs allocation: a SHARED Deflater breaks across
    * concurrent codegen'd tasks, but a per-row `new Deflater` pays a
    * native zlib stream init/free per document — so each task thread
    * keeps its own instances (one per level) in a ThreadLocal and
    * `reset()`s between rows, which zlib defines as restoring a fresh
    * stream (bit-identical output). The scratch buffer is likewise
    * per-thread and fixed-size: only the count is kept, so `deflate`
    * can loop over an 8 KiB window regardless of input length. The
    * native streams live as long as their executor task threads —
    * bounded by the thread pool, not the row count. */
  private val deflaters = ThreadLocal.withInitial[Array[Deflater]](() => new Array[Deflater](10))
  private val scratch = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  def compute(s: UTF8String, level: Int): Int = {
    val ds = deflaters.get()
    var d = ds(level)
    if (d == null) { d = new Deflater(level, /* nowrap = */ true); ds(level) = d }
    else d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = scratch.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column API (via the in-package bridge). */
  def deflate_len(c: Column, level: Int = 6): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c), level))
}
