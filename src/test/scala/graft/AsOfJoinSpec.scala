package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** AsOfJoin edge discipline (pinned explicitly) + a seeded randomized
  * equivalence check against a naive per-row reference evaluation. */
class AsOfJoinSpec extends SparkSpec {

  private def run(left: Seq[(Long, Long, Long)], // (id, key, ts)
      right: Seq[(Long, Long, Long, Double)] // (rid, key, ts, value)
  ): Map[Long, Option[(Long, Double)]] = {
    import spark.implicits._
    val l = left.toDF("click_id", "user_id", "ts")
    val r = right.toDF("event_id", "user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    AsOfJoin.asOf(l, r, "user_id", "ts", Seq("view_ts", "view_value"), "event_id")
      .collect()
      .map(row => row.getLong(0) ->
        Option(row.get(3)).map(ts => (ts.asInstanceOf[Long], row.getDouble(4))))
      .toMap
  }

  /** Naive reference: scan all right rows per left row. */
  private def naive(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)]): Map[Long, Option[(Long, Double)]] =
    left.map { case (id, k, ts) =>
      val eligible = right.filter(r => r._2 == k && r._3 <= ts)
      id -> (if (eligible.isEmpty) None else {
        val best = eligible.maxBy(r => (r._3, r._1)) // max ts, tie to max rid
        Some((best._3, best._4))
      })
    }.toMap

  test("edges: no prior right -> null; equal ts matches inclusively; right ties -> highest id") {
    val got = run(
      left = Seq((1L, 7L, 100L), (2L, 7L, 50L), (3L, 8L, 100L)),
      right = Seq(
        (10L, 7L, 100L, 1.0), // equal ts to click 1 -> matches (inclusive)
        (11L, 7L, 100L, 2.0), // same ts, higher id -> wins the tie
        (12L, 7L, 60L, 3.0), // after click 2 -> not visible to it
        (13L, 9L, 10L, 4.0))) // other key
    assert(got === Map(
      1L -> Some((100L, 2.0)),
      2L -> None,
      3L -> None))
  }

  test("seeded randomized: window formulation == naive per-row evaluation") {
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 12) {
      val nl = rnd.nextInt(25)
      val nr = rnd.nextInt(25)
      // few keys + coarse timestamps force key collisions and ts ties
      val ls = (0 until nl).map(i =>
        (i.toLong, 1L + rnd.nextInt(4), rnd.nextInt(20).toLong))
      val rs = (0 until nr).map(i =>
        (1000L + i, 1L + rnd.nextInt(4), rnd.nextInt(20).toLong,
          rnd.nextInt(10).toDouble))
      assert(run(ls, rs) === naive(ls, rs), s"round $round: ls=$ls rs=$rs")
    }
  }
}
