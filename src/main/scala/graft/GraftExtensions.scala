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
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.NanosFilterPushdown)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.graft.ColumnBridge

  val rollingMinHashBuilder: Seq[Expression] => Expression = {
    case Seq(text) => RollingMinHash(text, 8)
    case Seq(text, k) => RollingMinHash(text,
      k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "graft_rolling_minhash(text[, k]) takes 1 or 2 arguments")
  }

  val rollingMinHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_minhash"),
    new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_minhash"),
    rollingMinHashBuilder)

  /** Register on a session that already exists (the builder-extensions
    * route only affects sessions created with `.withExtensions`). */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "graft_rolling_minhash", rollingMinHashBuilder)
}
