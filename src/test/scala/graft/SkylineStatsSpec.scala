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
        (r.getDecimal(6).longValueExact(), r.getDouble(7))).toMap
    // n=40, every r=c=20, E=10: diff = 40*15 - 400 = 200 (or -200),
    // term = 200^2 / (40*20*20) = 2.5 on every cell
    assert(out(("x", 0L)) === (200L, 2.5))
    assert(out(("x", 1L)) === (-200L, 2.5))
    assert(out(("y", 1L)) === (200L, 2.5))
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
