package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (SURVEY.md §4 preference (c): custom
  * LogicalPlan + Strategy + SparkPlan), the native counterpart of the
  * composed union-tag formulation in Relational.asofJoin.
  *
  * Semantics: for each left row, attach the LAST right row with the
  * same key and right.time <= left.time (right side null when none).
  * Ties on right.time resolve to the last row in (time, right-row
  * sort) order — i.e. the greatest under the child ordering, matching
  * the composed operator.
  *
  * Scale shape: requiredChildDistribution co-clusters both sides on the
  * key and requiredChildOrdering sorts them (key, time) — Spark plans
  * ONE exchange per side (reused if the data is already bucketed) and
  * the merge itself is a streaming O(|L|+|R|) two-pointer pass per
  * partition with O(1) state: strictly less memory than the window
  * formulation, which buffers a partition's frame.
  *
  * Key/time are constrained to LONG expressions (project/encode
  * beforehand) — keeps comparisons branch-free without a generic
  * ordering dispatch.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    toleranceMicros: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    toleranceMicros: Long = Long.MaxValue) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // The right tiebreak makes "last row among equal (key, time)" well-
  // defined: ascending order => the kept match is the max tiebreak,
  // mirroring the composed operator's orderkey tie-break.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
            SortOrder(rightTieBreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey, leftTime), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey, rightTime), rightOut)
      // bind the right side as nullable — the no-match row is all nulls,
      // and a non-nullable BoundReference would read garbage instead
      val resultProj = UnsafeProjection.create(output,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      val rBuf = rIt.buffered
      // O(1) state: the current key's best-so-far right row (a copy —
      // Spark iterators reuse row objects) and its time, for the
      // tolerance check.
      var matchKey = 0L
      var matchTime = 0L
      var hasMatch = false
      var matchRow: InternalRow = null

      lIt.flatMap { lRow =>
        val lk = lKeyProj(lRow)
        if (lk.isNullAt(0) || lk.isNullAt(1)) {
          Iterator.single(resultProj(joined(lRow, nullRight)))
        } else {
          val k = lk.getLong(0)
          val t = lk.getLong(1)
          // advance right up to (key, time) <= (k, t)
          var continue = true
          while (continue && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            if (rk.isNullAt(0) || rk.isNullAt(1)) { rBuf.next() }
            else {
              val rkey = rk.getLong(0)
              val rt = rk.getLong(1)
              if (rkey < k || (rkey == k && rt <= t)) {
                val r = rBuf.next()
                if (rkey == k) {
                  matchKey = k; matchTime = rt; hasMatch = true; matchRow = r.copy()
                }
              } else continue = false
            }
          }
          // tolerance: a stale match (older than t - tolerance) is no match
          val m = if (hasMatch && matchKey == k && t - matchTime <= toleranceMicros)
            matchRow else nullRight
          Iterator.single(resultProj(joined(lRow, m)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, tol) :: Nil
    case _ => Nil
  }
}
