package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule — the (c)-tier `Rule[LogicalPlan]` rung of the custom
  * ladder: an INNER join whose only cross-side predicates are an
  * inclusive point-in-interval pair (`ts >= lo AND ts <= hi`, all
  * LongType micros) has no equi key, so Spark plans it as a broadcast
  * nested loop — O(|points|·|intervals|) comparisons. This rule rewrites
  * it into the bucketed shape of [[graft.operators.RangeJoin]]
  * AUTOMATICALLY: the points side gains a bucket column (one bucket per
  * point), the intervals side explodes to every bucket it covers, the
  * join gains the bucket equality as its equi key, and the original
  * predicates ride along as residual filters. Every match arises from
  * exactly one bucket, so the rewrite is output-identical (the
  * RangeJoinRuleSpec pins plan shape AND result equality against both
  * the naive join and the hand-bucketed operator).
  *
  * Conservative by construction: fires only on Inner joins with NO
  * cross-side equality conjunct (if one exists the planner already has
  * an equi key), with both bounds inclusive attribute comparisons on
  * LongType, point attribute on one side and both bounds on the other.
  * The rewritten join HAS a cross-side equality, so the rule is
  * idempotent. Inject via `GraftExtensions` (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** One-hour buckets over epoch-micros — matches RangeJoin's default. */
  val BucketWidthUs = 3600000000L

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjunctsOf(a) ++ conjunctsOf(b)
    case other => Seq(other)
  }

  // ts >= lo, written either way around
  private def asLower(e: Expression): Option[(Attribute, Attribute)] = e match {
    case GreaterThanOrEqual(t: Attribute, lo: Attribute) => Some((t, lo))
    case LessThanOrEqual(lo: Attribute, t: Attribute) => Some((t, lo))
    case _ => None
  }

  // ts <= hi, written either way around
  private def asUpper(e: Expression): Option[(Attribute, Attribute)] = e match {
    case LessThanOrEqual(t: Attribute, hi: Attribute) => Some((t, hi))
    case GreaterThanOrEqual(hi: Attribute, t: Attribute) => Some((t, hi))
    case _ => None
  }

  private def bucketOf(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(BucketWidthUs.toDouble, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = conjunctsOf(cond)
      val hasCrossEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      val matched = if (hasCrossEqui) None else (for {
        (t1, lo) <- conjuncts.flatMap(asLower)
        (t2, hi) <- conjuncts.flatMap(asUpper)
        if t1.semanticEquals(t2) && t1.dataType == LongType &&
          lo.dataType == LongType && hi.dataType == LongType
        pi <- if (left.outputSet.contains(t1) && right.outputSet.contains(lo)
              && right.outputSet.contains(hi))
            Some((left, right, t1, lo, hi, false))
          else if (right.outputSet.contains(t1) && left.outputSet.contains(lo)
              && left.outputSet.contains(hi))
            Some((right, left, t1, lo, hi, true))
          else None
      } yield pi).headOption
      matched match {
        case None => j
        case Some((points, intervals, ts, lo, hi, pointsOnRight)) =>
          val pBkt = Alias(bucketOf(ts), "_graft_bkt")()
          val pointsP = Project(points.output :+ pBkt, points)
          val ivBkt = AttributeReference("_graft_iv_bkt", LongType, nullable = false)()
          // an interval explodes to every bucket it covers; a degenerate
          // lo > hi row explodes to a descending sequence whose spurious
          // buckets the residual predicates eliminate
          // Sequence is TimeZoneAwareExpression: without an explicit zone
          // the rewritten plan counts as UNRESOLVED post-analysis
          val ivGen = Generate(Explode(Sequence(bucketOf(lo), bucketOf(hi), None,
              Some(conf.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ivBkt), child = intervals)
          val newCond = (EqualTo(pBkt.toAttribute, ivBkt) +: conjuncts).reduce(And)
          val (nl, nr) = if (pointsOnRight) (ivGen, pointsP) else (pointsP, ivGen)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
      }
  }
}
