package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Whole-operator extension demo: the as-of join as a FIRST-CLASS Catalyst
  * operator — logical node + planner strategy + custom physical operator —
  * the (c) tier of the engine's custom-operator ladder (expressions being
  * (b), see `TextHashExpressions`). Registered via
  * [[graft.plans.GraftExtensions]] (`injectPlannerStrategy`) or picked up
  * lazily through `spark.experimental.extraStrategies` by the
  * [[AsOfJoinNative.asOf]] wrapper.
  *
  * The physical operator is a true SORT-MERGE AS-OF: it declares
  * `ClusteredDistribution` on the key and per-child sort orders
  * ((key, ts) left; (key, ts, tie) right), so EnsureRequirements inserts
  * exactly one co-partitioning exchange + sorts, and each partition then
  * merges in ONE PASS with O(1) state (the latest right payload for the
  * current key) — no union row-padding, no window buffering, the same
  * network cost as the window formulation in
  * [[graft.operators.AsOfJoin]] with less per-row work. Semantics
  * (inclusive ≤ match, highest-tie right row wins equal timestamps) are
  * pinned equal to the window formulation in AsOfJoinNativeSpec.
  *
  * Contract: key/ts/tie are LongType (timestamps as epoch micros); right
  * payload column names must not collide with left columns.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightTie: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinNode = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, tie, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, tie, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightTie: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    val payloadExprs = rightPayload
    val rightSchema = right.output
    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rightSchema)
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      val joiner = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadExprs.size)
      // O(1) merge state: the latest right payload and the key it belongs to
      var lastKey = 0L
      var lastValid = false
      var lastPayload: InternalRow = nullPayload
      var pending: InternalRow = null // next unconsumed right row
      def advanceRight(): Unit = { pending = if (rIter.hasNext) rIter.next() else null }
      advanceRight()
      lIter.map { lRow =>
        val lk = lRow.getLong(lKeyIdx)
        val lt = lRow.getLong(lTsIdx)
        // consume rights with (rk < lk) or (rk == lk && rt <= lt); rights
        // are (key, ts, tie)-sorted, so the last consumed row of key lk is
        // the as-of match (greatest ts ≤ lt, ties to greatest tie)
        var advance = pending != null
        while (advance) {
          val rk = pending.getLong(rKeyIdx)
          if (rk < lk || (rk == lk && pending.getLong(rTsIdx) <= lt)) {
            lastKey = rk
            lastValid = true
            lastPayload = payloadProj(pending).copy()
            advanceRight()
            advance = pending != null
          } else advance = false
        }
        val matched = lastValid && lastKey == lk
        resultProj(joiner(lRow, if (matched) lastPayload else nullPayload))
      }
    }
  }
}

/** DataFrame-level entry point. */
object AsOfJoinNative {

  /** Native as-of join: attach to each left row the most recent right row
    * (`right(tsCol) <= left(tsCol)`, ties to highest `tieCol`) per
    * `keyCol`. key/ts/tie must be LongType. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String], tieCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy) &&
        !spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    // fresh exprIds on the right side (a shared scan would otherwise leak
    // duplicate attribute ids into the output)
    val r = right.select(
      (Seq(keyCol, tsCol, tieCol) ++ rightCols).distinct.map(c => col(c).as(c)): _*)
    val lp = left.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    Seq(attr(lp, keyCol), attr(lp, tsCol), attr(rp, keyCol), attr(rp, tsCol),
      attr(rp, tieCol)).foreach { a =>
      require(a.dataType == LongType, s"${a.name}: as-of native needs LongType, got ${a.dataType}")
    }
    val node = AsOfJoinNode(lp, rp,
      attr(lp, keyCol), attr(lp, tsCol),
      attr(rp, keyCol), attr(rp, tsCol), attr(rp, tieCol),
      rightCols.map(attr(rp, _)))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
