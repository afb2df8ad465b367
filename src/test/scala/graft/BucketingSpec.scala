package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any Exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val left = (1L to 5000L).map(i => (i, s"l$i")).toDF("id", "lv")
      val right = (1L to 5000L).map(i => (i, i * 2)).toDF("id", "rv")
      Bucketing.writeBucketed(left, "b_left", "id", 8, sortKey = Some("id"))
      Bucketing.writeBucketed(right, "b_right", "id", 8, sortKey = Some("id"))
      val joined = Bucketing.readBucketed(spark, "b_left")
        .join(Bucketing.readBucketed(spark, "b_right"), "id")
      assert(joined.count() === 5000L)
      // AQE hides children behind AdaptiveSparkPlanExec; the final plan
      // string is the reliable witness
      val planStr = joined.queryExecution.executedPlan.toString
      assert(!planStr.contains("Exchange"),
        s"expected a co-located bucket join with zero shuffles, got:\n$planStr")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
