package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.RangeJoinRewrite

/** The RangeJoinRewrite optimizer rule must turn a naive BETWEEN join
  * (no equi key → nested-loop plan) into the bucketed equi join, with
  * output identical to both the naive join and the hand-bucketed
  * operator. */
class RangeJoinRuleSpec extends SparkSpec {

  import spark.implicits._

  private val mi = 60L * 1000000 // one minute in micros

  private def points = Seq((10L, 30L * mi), (11L, 75L * mi), (12L, 200L * mi),
    (13L, 359L * mi)).toDF("p_id", "ts_us")
  private def intervals = Seq((1L, 0L * mi, 90L * mi), (2L, 60L * mi, 120L * mi),
    (3L, 300L * mi, 360L * mi), (4L, 500L * mi, 400L * mi)) // 4 is degenerate (lo > hi)
    .toDF("iv_id", "lo_us", "hi_us")

  private def naiveJoin = points.join(intervals,
    col("ts_us") >= col("lo_us") && col("ts_us") <= col("hi_us"))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // The rule is part of the standard test-session runtime
  // (SparkSpec calls GraftRuntime.enable); the baseline measurement
  // temporarily strips it and RESTORES the saved list — setting Nil
  // would disable the engine runtime for every later suite.

  test("rule rewrites the naive join: no nested loop, same result") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == RangeJoinRewrite)
    val expected = try {
      assert(naiveJoin.queryExecution.executedPlan.toString.contains("NestedLoop"),
        "precondition: without the rule the naive plan should be a nested loop")
      pairs(naiveJoin) // the BNLJ baseline result
    } finally spark.experimental.extraOptimizations = saved
    val rewritten = naiveJoin // standard runtime: rule active
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule did not remove the nested loop:\n$plan")
    assert(plan.contains("Generate explode"), s"no interval explode in:\n$plan")
    assert(pairs(rewritten) === expected)
    assert(expected === Set((10L, 1L), (11L, 1L), (11L, 2L), (13L, 3L)))
    // and it agrees with the hand-bucketed operator
    val manual = pairs(RangeJoin.pointInInterval(
      points, intervals, "ts_us", "lo_us", "hi_us"))
    assert(manual === expected)
  }

  /** Strip the rule, collect the baseline pairs, restore, re-plan with
    * the rule active, and pin both the plan shape and result equality. */
  private def assertRewrites(mkJoin: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == RangeJoinRewrite)
    val expected = try {
      assert(mkJoin.queryExecution.executedPlan.toString.contains("NestedLoop"),
        "precondition: without the rule this shape should be a nested loop")
      pairs(mkJoin)
    } finally spark.experimental.extraOptimizations = saved
    val rewritten = mkJoin
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule did not remove the nested loop:\n$plan")
    assert(pairs(rewritten) === expected)
    expected
  }

  test("rule fires on TIMESTAMP bounds (normalized to epoch micros)") {
    val ptsTs = points.select(col("p_id"), timestamp_micros(col("ts_us")).as("ts"))
    val ivTs = intervals.select(col("iv_id"),
      timestamp_micros(col("lo_us")).as("lo_ts"), timestamp_micros(col("hi_us")).as("hi_ts"))
    val expected = assertRewrites(ptsTs.join(ivTs,
      col("ts") >= col("lo_ts") && col("ts") <= col("hi_ts")))
    assert(expected === Set((10L, 1L), (11L, 1L), (11L, 2L), (13L, 3L)))
  }

  test("rule fires on literal-padded bounds (the sliding-window shape)") {
    // ts <= hi + 5min: the q73-windows shape that used to silently stay
    // a nested loop because the bound was Add(attr, literal), not attr
    val expected = assertRewrites(points.join(intervals,
      col("ts_us") >= col("lo_us") && col("ts_us") <= col("hi_us") + lit(5L * mi)))
    // interval 2's padded end (125min) now catches nothing new; point 12
    // (200min) still matches nothing; degenerate 4 still empty
    assert(expected === Set((10L, 1L), (11L, 1L), (11L, 2L), (13L, 3L)))
  }

  test("rule leaves equi joins alone") {
    val withKey = points.withColumn("k", col("p_id") % 2)
      .join(intervals.withColumn("k", col("iv_id") % 2), Seq("k"))
      .filter(col("ts_us") >= col("lo_us") && col("ts_us") <= col("hi_us"))
    val plan = withKey.queryExecution.optimizedPlan.toString
    assert(!plan.contains("_graft_bkt"), s"rule fired on an equi join:\n$plan")
    assert(withKey.count() >= 0)
  }

  // ---- interval × interval OVERLAP shape ----------------------------------

  private def aIv = Seq((10L, 0L * mi, 50L * mi), (11L, 70L * mi, 130L * mi),
    (12L, 200L * mi, 220L * mi), (13L, 350L * mi, 500L * mi))
    .toDF("a_id", "a_lo", "a_hi")
  private def bIv = Seq((1L, 40L * mi, 80L * mi), (2L, 100L * mi, 110L * mi),
    (3L, 180L * mi, 210L * mi), (4L, 600L * mi, 580L * mi)) // 4 degenerate (lo > hi)
    .toDF("iv_id", "lo_us", "hi_us")

  private def overlapPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rule rewrites the interval OVERLAP join: no nested loop, same result") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == RangeJoinRewrite)
    val naive = aIv.join(bIv,
      col("a_lo") <= col("hi_us") && col("lo_us") <= col("a_hi"))
    val expected = try {
      assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"),
        "precondition: without the rule the overlap join should be a nested loop")
      overlapPairs(naive)
    } finally spark.experimental.extraOptimizations = saved
    val rewritten = aIv.join(bIv,
      col("a_lo") <= col("hi_us") && col("lo_us") <= col("a_hi"))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule did not remove the nested loop:\n$plan")
    assert(plan.contains("Generate explode"), s"no interval explode in:\n$plan")
    assert(overlapPairs(rewritten) === expected)
    // a10 ∩ b1 (40-50), a11 ∩ b1 (70-80), a11 ∩ b2 (100-110),
    // a12 ∩ b3 (200-210); b4 degenerate matches nothing
    assert(expected === Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 3L)))
    // and it agrees with the hand-bucketed operator
    val manual = overlapPairs(RangeJoin.intervalOverlap(
      aIv, bIv, "a_lo", "a_hi", "lo_us", "hi_us"))
    assert(manual === expected)
  }

  test("overlap rewrite emits each long-span pair exactly once") {
    // spans covering many shared hour buckets must still emit one row
    val longA = Seq((20L, 0L * mi, 600L * mi)).toDF("a_id", "a_lo", "a_hi")
    val longB = Seq((5L, 30L * mi, 590L * mi)).toDF("iv_id", "lo_us", "hi_us")
    val joined = longA.join(longB,
      col("a_lo") <= col("hi_us") && col("lo_us") <= col("a_hi"))
    assert(!joined.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(joined.count() === 1L, "pair sharing 10 buckets must emit once")
  }

  test("overlap rewrite fires on TIMESTAMP bounds (normalized to epoch micros)") {
    val aTs = aIv.select(col("a_id"),
      timestamp_micros(col("a_lo")).as("a_lo_ts"), timestamp_micros(col("a_hi")).as("a_hi_ts"))
    val bTs = bIv.select(col("iv_id"),
      timestamp_micros(col("lo_us")).as("b_lo_ts"), timestamp_micros(col("hi_us")).as("b_hi_ts"))
    val joined = aTs.join(bTs,
      col("a_lo_ts") <= col("b_hi_ts") && col("b_lo_ts") <= col("a_hi_ts"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule did not fire on timestamp overlap bounds:\n$plan")
    assert(overlapPairs(joined) === Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 3L)))
  }

  test("bucket width is session-configurable; result identical at any width") {
    // a 10-hour span pair: at the default 1 h width it shares 10+
    // buckets, at a 1-day width it shares one — output must not change
    val longA = Seq((20L, 0L * mi, 600L * mi)).toDF("a_id", "a_lo", "a_hi")
    val longB = Seq((5L, 30L * mi, 590L * mi)).toDF("iv_id", "lo_us", "hi_us")
    def joined = longA.join(longB,
      col("a_lo") <= col("hi_us") && col("lo_us") <= col("a_hi"))
    spark.conf.set(RangeJoinRewrite.BucketWidthConfKey, 86400000000L.toString)
    try {
      assert(!joined.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(joined.count() === 1L)
    } finally spark.conf.unset(RangeJoinRewrite.BucketWidthConfKey)
    assert(joined.count() === 1L)
  }

  test("degenerate point-sized side still takes the one-sided point rewrite") {
    // a_lo == a_hi: the overlap condition degenerates to point-in-interval,
    // which the cheaper one-sided-explode branch handles (only the
    // intervals side explodes — the plan carries _graft_bkt, not _graft_a_bkt)
    val pts = Seq((30L, 45L * mi)).toDF("a_id", "a_pt")
    val joined = pts.join(bIv,
      col("a_pt") <= col("hi_us") && col("lo_us") <= col("a_pt"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("_graft_bkt") && !plan.contains("_graft_a_bkt"),
      s"expected the point branch, got:\n$plan")
    assert(overlapPairs(joined.withColumnRenamed("a_pt", "unused")
      .select(col("a_id"), col("iv_id"))) === Set((30L, 1L)))
  }
}
