package graft

import graft.operators.{Curation, Linkage, QualityChecks}
import org.apache.spark.sql.functions._

/** Unit coverage for the Pareto frontier, chi-squared cells, winsorize,
  * l-diversity, and sorted-neighborhood operators — closed-form answers
  * on constructed inputs plus a randomized brute-force cross-check for
  * the skyline (the cross-engine arithmetic is hash-gated by each
  * operator's registry row; these pin SEMANTICS). */
class SkylineStatsSpec extends SparkSpec {

  import spark.implicits._

  test("paretoFront keeps exactly the undominated points") {
    // (1.00, 5) and (2.00, 10) are the frontier; (3.00, 4) is dominated
    // by (2.00, 10); (1.00, 3) is dominated by (1.00, 5) at equal x
    val df = Seq((1L, 1.00, 5), (2L, 2.00, 10), (3L, 3.00, 4), (4L, 1.00, 3))
      .toDF("id", "price", "size")
    val front = QualityChecks.paretoFront(df, "price", "size", Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(front === Array(1L, 2L))
  }

  test("paretoFront: duplicates of a frontier point all survive") {
    val df = Seq((1L, 1.00, 5), (2L, 1.00, 5), (3L, 2.00, 4))
      .toDF("id", "price", "size")
    val front = QualityChecks.paretoFront(df, "price", "size", Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(front === Array(1L, 2L), "equal points dominate neither way")
  }

  test("paretoFront matches brute-force dominance on a seeded random set") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(50) + 1) / 4.0, rnd.nextInt(40)))
    val df = pts.toDF("id", "price", "size")
    val got = QualityChecks.paretoFront(df, "price", "size", Seq("id"))
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        (x2 <= x && y2 >= y) && (x2 < x || y2 > y) }
    }.map(_._1).toSet
    assert(got === want)
  }

  test("chi2Cells: independent 2x2 has zero discrepancy, skewed is exact") {
    val rows =
      Seq.fill(15)(("x", 0L)) ++ Seq.fill(5)(("x", 1L)) ++
      Seq.fill(5)(("y", 0L)) ++ Seq.fill(15)(("y", 1L))
    val out = QualityChecks.chi2Cells(rows.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(6), r.getDouble(7))).toMap
    // n=40, every r=c=20, E=10: diff = 40*15 - 400 = 200 (or -200),
    // term = 200^2 / (40*20*20) = 2.5 on every cell
    assert(out(("x", 0L)) === (200.0, 2.5))
    assert(out(("x", 1L)) === (-200.0, 2.5))
    assert(out(("y", 1L)) === (200.0, 2.5))
  }

  test("winsorize clamps to the exact p5/p95 group order statistics") {
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "g", "v")
    val out = QualityChecks.winsorize(df, "g", "v", 5, 95, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // cents: rank-5 value = 500, rank-95 value = 9500
    assert(out(1L) === (500L, 9500L, 500L), "below lo clamps up")
    assert(out(50L) === (500L, 9500L, 5000L), "interior unchanged")
    assert(out(99L) === (500L, 9500L, 9500L), "above hi clamps down")
  }

  test("lDiversityAudit flags homogeneous groups") {
    val df = Seq(
      (1L, "g1", "s1"), (2L, "g1", "s2"), (3L, "g1", "s3"),
      (4L, "g2", "sX"), (5L, "g2", "sX"), (6L, "g2", "sX"))
      .toDF("uid", "q", "sens")
    val out = Curation.lDiversityAudit(df, "uid", Seq("q"), "sens", l = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(out("g1") === (3L, true))
    assert(out("g2") === (1L, false), "k-anonymous but zero-diversity group")
  }

  test("sortedNeighborhoodPairs = every in-window pair within the gate") {
    val df = Seq((10L, "aaa"), (20L, "aab"), (30L, "abb"), (40L, "zzz"))
      .toDF("id", "name")
    val got = Linkage.sortedNeighborhoodPairs(df, "id", "name",
        col("name"), windowSize = 3, maxDist = 1)
      .select("a_id", "b_id", "gap", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    // sorted order: aaa(0) aab(1) abb(2) zzz(3); gaps < 3; dist <= 1
    // keeps (aaa,aab) and (aab,abb); (aaa,abb) is dist 2, zzz is dist 3
    assert(got === Set((10L, 20L, 1L, 1), (20L, 30L, 1L, 1)))
  }

  test("benfordAudit: exact digit extraction, ppm shares sum near 1e6") {
    // values 1.00..9.99 cents => digits follow the cents string head
    val df = Seq(1.23, 1.99, 2.50, 0.0, -3.0, 91.0, 0.05).toDF("v")
    val out = QualityChecks.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    // cents: 123, 199, 250, (0 and -300 dropped), 9100, 5
    assert(out.keySet === Set(1, 2, 9, 5))
    assert(out(1)._1 === 2L)
    assert(out(1)._2 === 301030L, "Benford constant for digit 1")
    assert(out(1)._3 === 400000L, "2 of 5 positive values")
    assert(out(5)._1 === 1L, "5-cent value leads with digit 5")
  }

  test("ecdfNormalize ranks data values against the reference ECDF") {
    val ref = Seq(1.0, 2.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val data = Seq((10L, 0.50), (20L, 2.00), (30L, 2.50), (40L, 9.0))
      .toDF("id", "v")
    val out = QualityChecks.ecdfNormalize(data, ref, "v", Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out(10L) === (0L, 4L, 0.0), "below every ref value")
    assert(out(20L) === (3L, 4L, 0.75), "ties count as <=")
    assert(out(30L) === (3L, 4L, 0.75), "between ref values")
    assert(out(40L) === (4L, 4L, 1.0), "above every ref value")
  }

  test("groupTrend recovers an exact linear series and nulls degenerate groups") {
    // y = 3x + 7 exactly; degenerate group has one distinct x
    val df = (Seq((0L, 7L), (1L, 10L), (2L, 13L), (3L, 16L)).map(p => ("lin", p._1, p._2)) ++
      Seq(("deg", 5L, 1L), ("deg", 5L, 9L))).toDF("g", "x", "y")
    val out = QualityChecks.groupTrend(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some((r.getDouble(4), r.getDouble(5))))).toMap
    assert(out("lin") === Some((3.0, 7.0)))
    assert(out("deg") === None, "single-x group has no defined slope")
  }

  /** Round-12 verdict #2: the SNM rank must come from the distributed
    * construction (range shards + per-shard local ranks + broadcast
    * offsets), byte-identical to the global row_number it replaced —
    * including duplicate sort keys (ties broken by id) and keys that
    * straddle shard boundaries. */
  test("distributedRank equals the global row_number on a tied, shuffled frame") {
    import org.apache.spark.sql.expressions.Window
    // 1000 rows, only 7 distinct sort keys — every shard boundary lands
    // inside a tie run, the case a range-consistent shard assignment
    // must get right via the id tiebreaker
    val df = (0 until 1000).map(i => ((i * 7919L) % 1000L, s"k${i % 7}"))
      .toDF("id", "nm").withColumn("sk", col("nm"))
    val got = graft.operators.Linkage.distributedRank(df)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("rn",
        (row_number().over(Window.orderBy(col("sk"), col("id"))) - 1).cast("long"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    // and the plan carries no single-partition sort of the data: every
    // Window is partitioned (the offset prefix-sum window runs above the
    // per-shard COUNT aggregate, not above data rows)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val unbounded = graft.operators.Linkage.distributedRank(df)
      .queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
    assert(unbounded.isEmpty, s"data-sized global window in distributedRank: $unbounded")
  }

  test("sortedNeighborhood bucket join covers every gap up to w-1") {
    // ids sort as their own key; window 4 must yield gaps 1, 2 and 3
    // across bucket boundaries (rank 3 -> 4 crosses buckets 0 -> 1)
    val df = (0 to 9).map(i => (i.toLong, f"n$i%02d")).toDF("id", "name")
    val got = Linkage.sortedNeighborhoodPairs(df, "id", "name",
        col("name"), windowSize = 4, maxDist = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0 to 9; b <- 0 to 9 if b > a && b - a < 4
    } yield (a.toLong, b.toLong)).toSet
    assert(got === want)
  }
}
