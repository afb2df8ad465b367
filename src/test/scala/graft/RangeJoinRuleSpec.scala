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
}
