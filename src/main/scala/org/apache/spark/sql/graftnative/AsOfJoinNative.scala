package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, TimestampType}

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
  * Contract: the exec merges LongType keys; the [[AsOfJoinNative.asOf]]
  * wrapper normalizes int/short/byte and TimestampType (epoch micros)
  * columns to longs on shadow columns, so callers keep their original
  * types. Right payload column names must not collide with left columns.
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

  // internal shadow columns carrying the normalized (LongType) join keys;
  // dropped from the result, so the caller's schema is untouched
  private val KeyShadow = "__graft_asof_key"
  private val TsShadow = "__graft_asof_ts"
  private val TieShadow = "__graft_asof_tie"

  /** Order-preserving normalization to the exec's LongType contract:
    * timestamps become epoch micros, integral types widen. Monotone, so
    * as-of semantics over the original column are preserved exactly. */
  private def toLong(c: Column, dt: DataType, name: String): Column = dt match {
    case LongType => c
    case TimestampType => unix_micros(c)
    case IntegerType | ShortType | ByteType => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"$name: as-of native needs a long/int/timestamp column, got $other")
  }

  /** Native as-of join: attach to each left row the most recent right row
    * (`right(tsCol) <= left(tsCol)`, ties to highest `tieCol`) per
    * `keyCol`. key/ts/tie may be any integral type or TimestampType
    * (compared as epoch micros under the hood); the result keeps the
    * caller's original column types. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String], tieCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy) &&
        !spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    def dt(df: DataFrame, c: String): DataType =
      df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"column $c not found")).dataType
    val lAug = left
      .withColumn(KeyShadow, toLong(col(keyCol), dt(left, keyCol), keyCol))
      .withColumn(TsShadow, toLong(col(tsCol), dt(left, tsCol), tsCol))
    // fresh projection on the right side: normalizes types AND gives the
    // node fresh exprIds (a shared scan would otherwise leak duplicate
    // attribute ids into the output)
    val r = right.select(
      toLong(col(keyCol), dt(right, keyCol), keyCol).as(KeyShadow) +:
        toLong(col(tsCol), dt(right, tsCol), tsCol).as(TsShadow) +:
        toLong(col(tieCol), dt(right, tieCol), tieCol).as(TieShadow) +:
        rightCols.map(c => col(c).as(c)): _*)
    val lp = lAug.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinNode(lp, rp,
      attr(lp, KeyShadow), attr(lp, TsShadow),
      attr(rp, KeyShadow), attr(rp, TsShadow), attr(rp, TieShadow),
      rightCols.map(attr(rp, _)))
    org.apache.spark.sql.classic.Dataset.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
      .drop(KeyShadow, TsShadow)
  }
}
