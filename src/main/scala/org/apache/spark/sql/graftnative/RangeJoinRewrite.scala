package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

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
  * an equi key), with both bounds inclusive comparisons over a supported
  * ordered domain, point expression on one side and both bounds on the
  * other. Supported operands are any DETERMINISTIC single-side
  * expressions of LongType (micros) or TimestampType — so a bare column,
  * a literal-padded bound (`ts <= hi + 300000000L`, the sliding-window
  * shape), or a TIMESTAMP column (normalized to epoch micros with the
  * same monotone mapping as `AsOfJoinNative.toLong`) all fire; the
  * normalization is order-preserving, so bucket membership — and hence
  * the match set — is unchanged. The rewritten join HAS a cross-side
  * equality, so the rule is idempotent. Inject via `GraftExtensions`
  * (spark.sql.extensions) or `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** One-hour buckets over epoch-micros — matches RangeJoin's default. */
  val BucketWidthUs = 3600000000L

  /** Session override for the bucket width: the explode blowup per
    * interval is ⌈span/width⌉ + 1, so a workload of week-long intervals
    * should widen the bucket (`SET spark.graft.rangeJoin.bucketUs =
    * 86400000000`) rather than pay a 169-way explode per row; the
    * rewrite is output-identical at ANY width (the emit-once /
    * residual predicates don't depend on it). */
  val BucketWidthConfKey = "spark.graft.rangeJoin.bucketUs"

  private def bucketWidthUs: Long =
    conf.getConfString(BucketWidthConfKey, "") match {
      case "" => BucketWidthUs
      case s => scala.util.Try(s.toLong).toOption.filter(_ > 0).getOrElse {
        // a typo'd tuning value silently falling back would make the
        // setting appear to have no effect with no signal — warn loudly
        logWarning(s"$BucketWidthConfKey='$s' is not a positive long; " +
          s"falling back to the default $BucketWidthUs us")
        BucketWidthUs
      }
    }

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjunctsOf(a) ++ conjunctsOf(b)
    case other => Seq(other)
  }

  // ts >= lo, written either way around
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(t, lo) => Some((t, lo))
    case LessThanOrEqual(lo, t) => Some((t, lo))
    case _ => None
  }

  // any `x <= y` conjunct, written either way around
  private def asLeq(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(b, a) => Some((a, b))
    case _ => None
  }

  // ts <= hi, written either way around
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(t, hi) => Some((t, hi))
    case GreaterThanOrEqual(hi, t) => Some((t, hi))
    case _ => None
  }

  /** Order-preserving normalization to long micros (the rule-level twin
    * of `AsOfJoinNative.toLong`): identity on LongType, epoch micros on
    * TimestampType. Monotone, so floor-bucketing the normalized value
    * yields the same membership as bucketing the original domain. */
  private def norm(e: Expression): Option[Expression] = e.dataType match {
    case LongType => Some(e)
    case TimestampType => Some(UnixMicros(e))
    case _ => None
  }

  /** A usable operand: deterministic (it is duplicated into the bucket
    * key), references exactly one side (checked by the caller), over a
    * normalizable domain. */
  private def supported(e: Expression): Boolean =
    e.deterministic && e.references.nonEmpty && norm(e).isDefined

  private def bucketOf(e: Expression): Expression =
    Floor(Divide(Cast(norm(e).get, DoubleType), Literal(bucketWidthUs.toDouble, DoubleType)))

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
        if t1.semanticEquals(t2) && supported(t1) && supported(lo) && supported(hi)
        boundRefs = lo.references ++ hi.references
        pi <- if (t1.references.subsetOf(left.outputSet)
              && boundRefs.subsetOf(right.outputSet))
            Some((left, right, t1, lo, hi, false))
          else if (t1.references.subsetOf(right.outputSet)
              && boundRefs.subsetOf(left.outputSet))
            Some((right, left, t1, lo, hi, true))
          else None
      } yield pi).headOption
      // the interval-OVERLAP shape (`aLo <= bHi AND bLo <= aHi`, the
      // second no-equi-key join users write naively): two cross-side
      // `<=` conjuncts whose operands split lo-left/hi-right and
      // lo-right/hi-left. Matched only when the point shape didn't fire
      // (a degenerate side with lo == hi IS a point-in-interval join and
      // takes the cheaper one-sided explode above).
      lazy val overlap = if (hasCrossEqui || matched.isDefined) None else (for {
        (aLo, bHi) <- conjuncts.flatMap(asLeq)
        (bLo, aHi) <- conjuncts.flatMap(asLeq)
        if !(aLo.semanticEquals(bLo) && bHi.semanticEquals(aHi)) // distinct conjuncts
        if Seq(aLo, aHi, bLo, bHi).forall(supported)
        if aLo.references.subsetOf(left.outputSet) &&
          aHi.references.subsetOf(left.outputSet) &&
          bLo.references.subsetOf(right.outputSet) &&
          bHi.references.subsetOf(right.outputSet)
      } yield (aLo, aHi, bLo, bHi)).headOption
      matched match {
        case None => overlap match {
          case None => j
          case Some((aLo, aHi, bLo, bHi)) =>
            // both sides explode to every bucket they cover
            // (degenerate lo > hi rows yield descending sequences whose
            // spurious buckets the residual predicates eliminate); the
            // emit-once conjunct keeps only the bucket holding the
            // intersection's left edge — covered by BOTH sides, so each
            // overlapping pair appears exactly once and the output
            // equals the naive θ-join (RangeJoin.intervalOverlap's
            // contract, applied automatically)
            val tz = Some(conf.sessionLocalTimeZone)
            val aBkt = AttributeReference("_graft_a_bkt", LongType, nullable = false)()
            val bBkt = AttributeReference("_graft_b_bkt", LongType, nullable = false)()
            val aGen = Generate(Explode(Sequence(bucketOf(aLo), bucketOf(aHi), None, tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(aBkt), child = left)
            val bGen = Generate(Explode(Sequence(bucketOf(bLo), bucketOf(bHi), None, tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bBkt), child = right)
            val emitOnce = EqualTo(aBkt,
              Floor(Divide(Cast(Greatest(Seq(norm(aLo).get, norm(bLo).get)), DoubleType),
                Literal(bucketWidthUs.toDouble, DoubleType))))
            val newCond = (EqualTo(aBkt, bBkt) +: emitOnce +: conjuncts).reduce(And)
            Project(j.output, Join(aGen, bGen, Inner, Some(newCond), hint))
        }
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
