package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

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
    toleranceMicros: Long = Long.MaxValue)
  extends BinaryExecNode with CodegenSupport {

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

  // ---- whole-stage codegen ---------------------------------------------
  // Modeled on SortMergeJoinExec's two-input-iterator scheme: this node
  // is the ROOT of its codegen stage and reads both (exchanged+sorted)
  // children as plain row iterators — the streaming two-pointer merge
  // becomes a single generated loop with O(1) state, fused with
  // whatever project/filter sits above it. Note the children are NOT
  // fused into this stage (CollapseCodegenStages only inserts
  // InputAdapters for Spark's own join nodes); they execute as their
  // own stages, which is exactly the interpreted path's shape.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];")
    // O(1) merge state, all fields so it survives processNext re-entry
    val rightHead = ctx.addMutableState("InternalRow", "asofRightHead")
    val hasMatch = ctx.addMutableState("boolean", "asofHasMatch")
    val matchKey = ctx.addMutableState("long", "asofMatchKey")
    val matchTime = ctx.addMutableState("long", "asofMatchTime")
    val matchRow = ctx.addMutableState("InternalRow", "asofMatchRow")

    // right-side (key, time) evaluated against the lookahead row inside
    // a private advance() function
    ctx.currentVars = null
    ctx.INPUT_ROW = rightHead
    val rkCode = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rtCode = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advance = ctx.addNewFunction("asofAdvance",
      s"""
         |private void asofAdvance(long lk, long lt) {
         |  while ($rightHead != null || $rightInput.hasNext()) {
         |    if ($rightHead == null) {
         |      $rightHead = (InternalRow) $rightInput.next();
         |    }
         |    ${rkCode.code}
         |    ${rtCode.code}
         |    if (${rkCode.isNull} || ${rtCode.isNull}) { $rightHead = null; continue; }
         |    long rkey = ${rkCode.value};
         |    long rt = ${rtCode.value};
         |    if (rkey < lk || (rkey == lk && rt <= lt)) {
         |      if (rkey == lk) {
         |        $matchKey = rkey; $matchTime = rt; $hasMatch = true;
         |        $matchRow = $rightHead.copy();
         |      }
         |      $rightHead = null;
         |    } else {
         |      return;
         |    }
         |  }
         |}
       """.stripMargin)

    // left-side (key, time) evaluated in the main loop
    val leftRow = ctx.freshName("leftRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lkCode = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val ltCode = BindReferences.bindReference(leftTime, left.output).genCode(ctx)

    // output columns: left read eagerly from leftRow; right null-guarded
    // on the matched row (null row => all-null right side)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      val value = ctx.freshName("leftVal")
      val isNull = ctx.freshName("leftIsNull")
      val javaType = CodeGenerator.javaType(a.dataType)
      val getter = CodeGenerator.getValue(leftRow, a.dataType, i.toString)
      val code =
        code"""
           |boolean $isNull = $leftRow.isNullAt($i);
           |$javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getter);
         """.stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    val matchedRow = ctx.freshName("matchedRow")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val value = ctx.freshName("rightVal")
      val isNull = ctx.freshName("rightIsNull")
      val javaType = CodeGenerator.javaType(a.dataType)
      val getter = CodeGenerator.getValue(matchedRow, a.dataType, i.toString)
      val code =
        code"""
           |boolean $isNull = $matchedRow == null || $matchedRow.isNullAt($i);
           |$javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getter);
         """.stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }

    val matched = ctx.freshName("matched")
    val numOutput = metricTerm(ctx, "numOutputRows")
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkCode.code}
       |  ${ltCode.code}
       |  boolean $matched = false;
       |  if (!(${lkCode.isNull} || ${ltCode.isNull})) {
       |    $advance(${lkCode.value}, ${ltCode.value});
       |    $matched = $hasMatch && $matchKey == ${lkCode.value} &&
       |      ${ltCode.value} - $matchTime <= ${toleranceMicros}L;
       |  }
       |  InternalRow $matchedRow = $matched ? $matchRow : null;
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

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
