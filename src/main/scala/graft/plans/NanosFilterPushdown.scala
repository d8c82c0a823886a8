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

  /** Largest |µs| literal whose ±999ns-slackened nanos bound still fits a
    * Long. Literals beyond this (e.g. a `ts <= '9999-12-31'` sentinel,
    * ≈2.53e17 µs) would wrap on *1000 and silently filter everything out,
    * so derivation is skipped — the original filter alone still applies,
    * preserving the bit-identical contract. */
  private val SafeUs = (Long.MaxValue - 999L) / 1000L

  private def usLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, TimestampType) if math.abs(v) <= SafeUs => Some(v)
    case _ => None
  }

  /** (raw attr, µs literal) if `a` is the conversion and `b` the literal. */
  private def pairOf(a: Expression, b: Expression): Option[(Attribute, Long)] =
    for (attr <- rawOf(a); v <- usLit(b)) yield (attr, v)

  // Bound constructors with ±999ns slack for integer-division rounding.
  private def rawGeq(a: Attribute, v: Long) = GreaterThanOrEqual(a, Literal(v * 1000 - 999, LongType))
  private def rawGt(a: Attribute, v: Long)  = GreaterThan(a, Literal(v * 1000 - 999, LongType))
  private def rawLeq(a: Attribute, v: Long) = LessThanOrEqual(a, Literal(v * 1000 + 999, LongType))
  private def rawLt(a: Attribute, v: Long)  = LessThan(a, Literal(v * 1000 + 999, LongType))

  /** Derived raw-nanos bound implied by `cmp` (None if not derivable).
    * Each case tries both operand orders: `converted OP lit` and the
    * mirrored `lit OP converted` (which flips the bound direction). */
  private def derive(cmp: Expression): Option[Expression] = cmp match {
    // converted >= L  ⟹ raw >= L*1000 - 999 (slack for div rounding)
    case GreaterThanOrEqual(l, r) =>
      pairOf(l, r).map((rawGeq _).tupled).orElse(pairOf(r, l).map((rawLeq _).tupled))
    case GreaterThan(l, r) =>
      pairOf(l, r).map((rawGt _).tupled).orElse(pairOf(r, l).map((rawLt _).tupled))
    case LessThanOrEqual(l, r) =>
      pairOf(l, r).map((rawLeq _).tupled).orElse(pairOf(r, l).map((rawGeq _).tupled))
    case LessThan(l, r) =>
      pairOf(l, r).map((rawLt _).tupled).orElse(pairOf(r, l).map((rawGt _).tupled))
    case EqualTo(l, r) =>
      pairOf(l, r).orElse(pairOf(r, l)).map { case (a, v) => And(rawGeq(a, v), rawLeq(a, v)) }
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
