package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.AsOfJoinNative
import graft.operators.AsOfJoin

/** The custom Catalyst as-of operator (logical node + strategy + physical
  * sort-merge exec) must agree with the window formulation on random
  * inputs, and its plan must contain the custom exec node. */
class AsOfJoinNativeSpec extends SparkSpec {

  private def both(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    val l = left.toDF("click_id", "user_id", "ts")
    val r = right.toDF("event_id", "user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    val native = AsOfJoinNative.asOf(l, r, "user_id", "ts",
        Seq("view_ts", "view_value"), "event_id")
      .collect()
      .map(row => row.getLong(0) ->
        Option(row.get(3)).map(ts => (ts.asInstanceOf[Long], row.getDouble(4))))
      .toMap
    val window = AsOfJoin.asOf(l, r, "user_id", "ts",
        Seq("view_ts", "view_value"), "event_id")
      .collect()
      .map(row => row.getLong(0) ->
        Option(row.get(3)).map(ts => (ts.asInstanceOf[Long], row.getDouble(4))))
      .toMap
    (native, window)
  }

  test("plan contains the custom AsOfJoinExec node") {
    import spark.implicits._
    val l = Seq((1L, 7L, 100L)).toDF("click_id", "user_id", "ts")
    val r = Seq((10L, 7L, 90L, 1.0)).toDF("event_id", "user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("event_id"), col("value").as("view_value"))
    val df = AsOfJoinNative.asOf(l, r, "user_id", "ts", Seq("view_value"), "event_id")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.collect().map(r0 => (r0.getLong(0), r0.getDouble(3))).toSeq === Seq((1L, 1.0)))
  }

  test("timestamp + int columns end-to-end, original types preserved") {
    import org.apache.spark.sql.types.{IntegerType, TimestampType}
    import spark.implicits._
    val l = Seq((1, "2026-01-01 00:00:10"), (2, "2026-01-01 00:00:09"))
      .toDF("key", "t")
      .select(col("key").cast("int").as("key"), to_timestamp(col("t")).as("ts"))
    val r = Seq(
        (1, "2026-01-01 00:00:08", 7L, 1.5),
        (1, "2026-01-01 00:00:09", 8L, 2.5), // latest ts <= left(1) wins
        (2, "2026-01-01 00:00:07", 9L, 3.5))
      .toDF("key", "t", "tie", "v")
      .select(col("key").cast("int").as("key"),
        to_timestamp(col("t")).as("ts"), col("tie"), col("v"))
    val out = AsOfJoinNative.asOf(l, r, "key", "ts", Seq("v"), "tie")
    assert(out.schema("key").dataType === IntegerType)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val m = out.collect().map(r0 => r0.getInt(0) -> r0.getDouble(2)).toMap
    assert(m === Map(1 -> 2.5, 2 -> 3.5))
  }

  test("seeded randomized: native sort-merge == window formulation") {
    val rnd = new scala.util.Random(42L)
    for (round <- 1 to 10) {
      val nl = rnd.nextInt(30)
      val nr = rnd.nextInt(30)
      val ls = (0 until nl).map(i =>
        (i.toLong, 1L + rnd.nextInt(4), rnd.nextInt(20).toLong))
      val rs = (0 until nr).map(i =>
        (1000L + i, 1L + rnd.nextInt(4), rnd.nextInt(20).toLong,
          rnd.nextInt(10).toDouble))
      val (native, window) = both(ls, rs)
      assert(native === window, s"round $round: ls=$ls rs=$rs")
    }
  }
}
