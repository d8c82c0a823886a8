package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.plans.RollingMinHash

/** Session extensions: registers graft's native expressions for SQL use.
  *
  * ```
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // then: SELECT graft_rolling_minhash(text, 8) FROM docs
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.rollingMinHashDescriptor)
    e.injectFunction(GraftExtensions.polyHash64Descriptor)
    e.injectFunction(GraftExtensions.deflateLenDescriptor)
    e.injectFunction(GraftExtensions.bpeMergePairDescriptor)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.NanosFilterPushdown)
    e.injectOptimizerRule(_ => graft.plans.BroadcastHintGuard)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.graft.ColumnBridge

  /** A SQL-surface argument that must be a non-null foldable literal —
    * rejects columns (Unevaluable would surface as an internal error)
    * and NULL (String.valueOf(null) would silently become "null"). */
  private def litOf(e: Expression, fn: String, arg: String): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be a literal, not a column")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$fn: $arg must not be NULL")
    v
  }

  private def litInt(e: Expression, fn: String, arg: String): Int =
    litOf(e, fn, arg) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got '$other'")
    }

  private def litString(e: Expression, fn: String, arg: String): String =
    litOf(e, fn, arg).toString

  val rollingMinHashBuilder: Seq[Expression] => Expression = {
    case Seq(text) => RollingMinHash(text, 8)
    case Seq(text, k) => RollingMinHash(text,
      litInt(k, "graft_rolling_minhash", "k"))
    case _ => throw new IllegalArgumentException(
      "graft_rolling_minhash(text[, k]) takes 1 or 2 arguments")
  }

  val rollingMinHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_minhash"),
    new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_minhash"),
    rollingMinHashBuilder)

  val polyHash64Builder: Seq[Expression] => Expression = {
    case Seq(text) => graft.plans.PolyHash64(text)
    case _ => throw new IllegalArgumentException(
      "graft_poly_hash64(text) takes 1 argument")
  }

  val polyHash64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_poly_hash64"),
    new ExpressionInfo(classOf[graft.plans.PolyHash64].getName, "graft_poly_hash64"),
    polyHash64Builder)

  val deflateLenBuilder: Seq[Expression] => Expression = {
    case Seq(text) => graft.plans.DeflateLen(text, 6)
    case Seq(text, lvl) => graft.plans.DeflateLen(text,
      litInt(lvl, "graft_deflate_len", "level"))
    case _ => throw new IllegalArgumentException(
      "graft_deflate_len(text[, level]) takes 1 or 2 arguments")
  }

  val deflateLenDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_deflate_len"),
    new ExpressionInfo(classOf[graft.plans.DeflateLen].getName, "graft_deflate_len"),
    deflateLenBuilder)

  val bpeMergePairBuilder: Seq[Expression] => Expression = {
    case Seq(syms, a, b) => graft.plans.BpeMergePair(syms,
      litString(a, "graft_bpe_merge_pair", "a"),
      litString(b, "graft_bpe_merge_pair", "b"))
    case _ => throw new IllegalArgumentException(
      "graft_bpe_merge_pair(symbols, a, b) takes 3 arguments (a, b literals)")
  }

  val bpeMergePairDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_merge_pair"),
    new ExpressionInfo(classOf[graft.plans.BpeMergePair].getName, "graft_bpe_merge_pair"),
    bpeMergePairBuilder)

  /** Register on a session that already exists (the builder-extensions
    * route only affects sessions created with `.withExtensions`). */
  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "graft_rolling_minhash", rollingMinHashBuilder)
    ColumnBridge.registerFunction(spark, "graft_poly_hash64", polyHash64Builder)
    ColumnBridge.registerFunction(spark, "graft_deflate_len", deflateLenBuilder)
    ColumnBridge.registerFunction(spark, "graft_bpe_merge_pair", bpeMergePairBuilder)
  }
}
