package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native document fingerprint: minimum Karp-Rabin rolling hash over all
  * character k-grams of the input (winnowing-style identity, SURVEY.md
  * §2.3#45 scale path).
  *
  * Why a custom Expression (preference (b) in SURVEY §4): the built-in
  * route — substring explode or HOF transform over generated indices —
  * is O(len·k) with per-gram string allocation and interpreted lambdas;
  * this is one O(len) pass over the raw UTF8 bytes with zero
  * allocation. Codegen calls the same static kernel the interpreted
  * path uses, so both execution modes agree bit-for-bit.
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k-gram size must be >= 1, got $k")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_minhash"

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingMinHash.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  final val Base = 1000003L

  /** splitmix64 finalizer — spreads the polynomial hash. Shared with
    * [[PolyHash64]] so both kernels stay oracle-replayable with one
    * HUGEINT recipe. */
  private[plans] def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4ecda9226d4e9L
    z ^ (z >>> 31)
  }

  /** One pass over the UTF-8 bytes (byte-level grams; multi-byte chars
    * simply contribute their bytes — fine for a fingerprint). Returns
    * Long.MaxValue for inputs shorter than k. */
  def compute(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return Long.MaxValue
    // B^(k-1) for the rolling subtract, with wraparound semantics.
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var minH = mix(h)
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * bk) * Base + (bytes(i) & 0xff)
      val m = mix(h)
      if (m < minH) minH = m
      i += 1
    }
    minH
  }

  /** Column API (via the in-package bridge — see ColumnBridge). */
  def rolling_min_hash(c: Column, k: Int = 8): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(c), k))
}
