package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Bucketed interval-overlap join == naive θ-join (seeded random
  * intervals spanning multiple buckets), each pair emitted exactly once;
  * plus the as-of tolerance variant vs a naive per-row reference. */
class IntervalOverlapSpec extends SparkSpec {

  test("intervalOverlap == naive theta join, one row per overlapping pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // spans up to 3.5 buckets at width 100 so the explode + emit-once
    // rule is exercised across bucket boundaries
    val as = (0 until 120).map { i =>
      val lo = rnd.nextInt(2000).toLong; (i.toLong, lo, lo + rnd.nextInt(350)) }
    val bs = (0 until 120).map { i =>
      val lo = rnd.nextInt(2000).toLong; (i.toLong, lo, lo + rnd.nextInt(350)) }
    val a = as.toDF("a_id", "a_lo", "a_hi")
    val b = bs.toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidthUs = 100L)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = for {
      (ai, alo, ahi) <- as
      (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)
    assert(got.size === got.toSet.size, "a pair emitted more than once")
    assert(got.toSet === want.toSet)
  }

  test("asOfWithin: staler-than-tolerance matches null out, left rows stay") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val tol = 5L
    val ls = (0 until 40).map(i => (i.toLong, 1L + rnd.nextInt(3), rnd.nextInt(30).toLong))
    val rs = (0 until 40).map(i =>
      (1000L + i, 1L + rnd.nextInt(3), rnd.nextInt(30).toLong, rnd.nextInt(10).toDouble))
    val l = ls.toDF("click_id", "user_id", "ts")
    val r = rs.toDF("event_id", "user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    val got = AsOfJoin.asOfWithin(l, r, "user_id", "ts",
        Seq("view_ts", "view_value"), "event_id", toleranceUs = tol)
      .collect()
      .map(row => row.getLong(0) ->
        Option(row.get(3)).map(ts => (ts.asInstanceOf[Long], row.getDouble(4))))
      .toMap
    val want = ls.map { case (id, k, ts) =>
      val eligible = rs.filter(x => x._2 == k && x._3 <= ts && ts - x._3 <= tol)
      id -> (if (eligible.isEmpty) None else {
        val best = eligible.maxBy(x => (x._3, x._1))
        Some((best._3, best._4))
      })
    }.toMap
    assert(got === want)
    assert(got.size === ls.size, "tolerance must not drop left rows")
  }
}
