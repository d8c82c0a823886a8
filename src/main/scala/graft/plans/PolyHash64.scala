package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit token hash: byte-polynomial (base 1000003, mod 2^64) over the
  * UTF-8 bytes, finished with the splitmix64 mixer — the same kernel
  * family as [[RollingMinHash]], chosen over xxhash64 because every step
  * is replayable in ANSI SQL with 128-bit integers (the q_dedup_simhash
  * DuckDB oracle re-derives it in HUGEINT, the proof pattern established
  * by the q_rolling_fingerprint oracle). Bit-avalanche quality from the
  * mixer is what SimHash needs: each output bit flips with ~1/2
  * probability across tokens, so the ±1 votes are unbiased.
  *
  * One O(len) pass, zero allocation; codegen calls the same static
  * kernel as the interpreted path, so both modes agree bit-for-bit
  * (pinned in CustomSpec).
  */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {

  /** Polynomial fold over the raw UTF-8 bytes, then splitmix64. Long
    * overflow IS the mod-2^64 wraparound the oracle emulates. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * RollingMinHash.Base + (bytes(i) & 0xff); i += 1 }
    RollingMinHash.mix(h)
  }

  /** Column API (via the in-package bridge — see ColumnBridge). */
  def poly_hash64(c: Column): Column =
    ColumnBridge.column(PolyHash64(ColumnBridge.expression(c)))
}
