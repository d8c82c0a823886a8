package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule (SURVEY §4 preference (c)): derive raw-nanos scan
  * bounds from filters on the CONVERTED events timestamp.
  *
  * `Tables.events` reads TIMESTAMP(NANOS) parquet as a raw long and
  * converts with `timestamp_micros(ts div 1000)`. A user filter on the
  * converted column sits above that Project, so nothing reaches the
  * parquet scan — at 100 TB that is a full scan regardless of how
  * narrow the time window is (`Tables.eventsRange` is the manual
  * workaround). This rule finds comparisons between such a converted
  * column and a timestamp literal and injects the IMPLIED bound on the
  * raw nanos column below the Project, where ordinary pushdown carries
  * it into the scan's PushedFilters / row-group pruning.
  *
  * The original filter is kept — the derived bound is a superset
  * condition (with ±1µs slack so integer-division rounding can never
  * drop a qualifying row), so results are bit-identical with the rule
  * on or off.
  */
object NanosFilterPushdown extends Rule[LogicalPlan] {

  /** The raw nanos attribute inside a timestamp_micros(raw div 1000)
    * conversion, if `e` is exactly that shape. By the time this rule
    * runs, Spark's PushDownPredicates has substituted the conversion
    * alias into the filter, so the pattern appears INLINE in the
    * condition right above the scan. */
  private def rawOf(e: Expression): Option[Attribute] = e match {
    case MicrosToTimestamp(IntegralDivide(
        raw: AttributeReference, Literal(1000L, LongType), _))
        if raw.dataType == LongType => Some(raw)
    case _ => None
  }

  private def usLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, TimestampType) => Some(v)
    case _ => None
  }

  /** Derived raw-nanos bound implied by `cmp` (None if not derivable). */
  private def derive(cmp: Expression): Option[Expression] = cmp match {
    // converted >= L  ⟹ raw >= L*1000 - 999 (slack for div rounding)
    case GreaterThanOrEqual(l, r) => for (a <- rawOf(l); v <- usLit(r))
      yield GreaterThanOrEqual(a, Literal(v * 1000 - 999, LongType))
    case GreaterThan(l, r) => for (a <- rawOf(l); v <- usLit(r))
      yield GreaterThan(a, Literal(v * 1000 - 999, LongType))
    case LessThanOrEqual(l, r) => for (a <- rawOf(l); v <- usLit(r))
      yield LessThanOrEqual(a, Literal(v * 1000 + 999, LongType))
    case LessThan(l, r) => for (a <- rawOf(l); v <- usLit(r))
      yield LessThan(a, Literal(v * 1000 + 999, LongType))
    case EqualTo(l, r) => for (a <- rawOf(l); v <- usLit(r))
      yield And(GreaterThanOrEqual(a, Literal(v * 1000 - 999, LongType)),
                LessThanOrEqual(a, Literal(v * 1000 + 999, LongType)))
    // literal-on-the-left mirrors
    case GreaterThanOrEqual(l, r) if usLit(l).isDefined && rawOf(r).isDefined =>
      derive(LessThanOrEqual(r, l))
    case GreaterThan(l, r) if usLit(l).isDefined && rawOf(r).isDefined =>
      derive(LessThan(r, l))
    case LessThanOrEqual(l, r) if usLit(l).isDefined && rawOf(r).isDefined =>
      derive(GreaterThanOrEqual(r, l))
    case LessThan(l, r) if usLit(l).isDefined && rawOf(r).isDefined =>
      derive(GreaterThan(r, l))
    case _ => None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConj(cond)
      val derived = conjuncts.flatMap(derive)
      // idempotence: add only bounds the condition doesn't already carry
      val fresh = derived.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduce(And), child)
  }

  /** Install on a running session (builder extensions only apply to
    * sessions created after them). */
  def install(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraOptimizations.contains(this))
      ss.experimental.extraOptimizations = ss.experimental.extraOptimizations :+ this
  }
}
