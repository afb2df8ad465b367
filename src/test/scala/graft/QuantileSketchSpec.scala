package graft

import graft.operators.{KllSketch, Quantiles}
import org.apache.spark.sql.functions._

/** KLL sketch: rank-error bounds vs exact sorts, mergeability (the
  * 100-TB property: per-partition sketches tree-reduce without
  * shuffling raw values), and the streaming fold twin. Like the
  * countMin/HLL specs, these pin BOUNDS, not exact estimates — the
  * estimate is order-dependent, the bound is not. */
class QuantileSketchSpec extends SparkSpec {

  private val K = 200
  // constant-capacity KLL with k=200: observed max rank error on 1e5
  // items is well under 1%; 3% is a safe deterministic ceiling
  private def bound(n: Long): Long = math.max(2L, (0.03 * n).toLong)

  private def seededData(n: Int): Array[Double] = {
    val rnd = new scala.util.Random(42L)
    // heavy right tail + duplicates: the shapes that break naive samplers
    Array.fill(n)(math.floor(math.exp(rnd.nextGaussian() * 2) * 100) / 100)
  }

  test("rank and quantile error within bound on skewed data") {
    val xs = seededData(100000)
    val s = KllSketch.fromValues(xs, K)
    assert(s.n === xs.length)
    val sorted = xs.sorted
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(p)
      val exactRank = sorted.count(_ <= est)
      val target = math.ceil(p * xs.length).toLong
      assert(math.abs(exactRank - target) <= bound(xs.length),
        s"p=$p: estimate $est has exact rank $exactRank, target $target")
    }
    // space: O(k log(n/k)) retained, not O(n)
    assert(s.retained < 12 * K, s"retained ${s.retained} items for n=${s.n}")
  }

  test("merge of split sketches obeys the same bound as one-shot") {
    val xs = seededData(60000)
    val (a, b) = xs.splitAt(17000)
    val merged = KllSketch.fromValues(a, K).merge(KllSketch.fromValues(b, K))
    assert(merged.n === xs.length)
    val sorted = xs.sorted
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val exactRank = sorted.count(_ <= merged.quantile(p))
      val target = math.ceil(p * xs.length).toLong
      assert(math.abs(exactRank - target) <= bound(xs.length),
        s"merged p=$p: rank $exactRank vs target $target")
    }
    // merge must not mutate its inputs
    val a2 = KllSketch.fromValues(a, K)
    val before = a2.n
    a2.merge(KllSketch.fromValues(b, K))
    assert(a2.n === before)
  }

  test("sketchColumn distributes: per-partition sketches match the exact sort's ranks") {
    import spark.implicits._
    val xs = seededData(50000)
    val df = spark.sparkContext.parallelize(xs.toSeq, 8).toDF("v")
    val s = Quantiles.sketchColumn(df, "v", K)
    assert(s.n === xs.length)
    val sorted = xs.sorted
    for (p <- Seq(0.25, 0.5, 0.95)) {
      val exactRank = sorted.count(_ <= s.quantile(p))
      assert(math.abs(exactRank - math.ceil(p * xs.length).toLong) <= bound(xs.length))
    }
    val report = Quantiles.quantileReport(df, "v", Seq(0.5, 0.9))
    assert(report.columns.toSeq === Seq("p", "value_est", "n", "retained"))
    assert(report.count() === 2)
    // nulls are ignored, not counted
    val withNulls = df.select(when(col("v") > 1e12, col("v")).as("v"))
    assert(Quantiles.sketchColumn(withNulls.limit(100), "v", K).n === 0)
  }

  test("native grouped aggregate: per-group estimates within bound for every merge order") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    // three groups with different scales and sizes, scattered over 16
    // partitions so each group's sketch is genuinely merged map-side
    val rows = (0 until 30000).map { i =>
      val g = i % 3
      val v = math.floor(math.exp(rnd.nextGaussian() + g) * 100) / 100
      (s"g$g", v)
    }
    val df = spark.sparkContext.parallelize(rnd.shuffle(rows), 16).toDF("g", "v")
    val ps = Seq(0.1, 0.5, 0.95)
    val out = Quantiles.groupedQuantileReport(df, "g", "v", ps, K)
    assert(out.columns.toSeq === Seq("g", "p", "value_est", "n"))
    val got = out.collect().map(r =>
      (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got.size === 3 * ps.size)
    val byGroup = rows.groupBy(_._1)
    for (g <- byGroup.keys; p <- ps) {
      val xs = byGroup(g).map(_._2).sorted
      val (est, n) = got((g, p))
      assert(n === xs.length)
      val exactRank = xs.count(_ <= est)
      val target = math.ceil(p * xs.length).toLong
      assert(math.abs(exactRank - target) <= bound(xs.length),
        s"group $g p=$p: estimate $est rank $exactRank vs target $target")
    }
    // all-null group evaluates to null estimates, not a crash
    val nulls = Seq(("a", Option.empty[Double]), ("a", None), ("b", Some(1.0)))
      .toDF("g", "v")
    val agg = nulls.groupBy($"g").agg(
      org.apache.spark.sql.graftnative.SketchAggregates
        .kllQuantiles($"v", Seq(0.5), K).as("est"))
    val m = agg.collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(m("a") === true && m("b") === false)
    // ...and the REPORT keeps the all-null group as a (g, value_est =
    // null, n = 0) row rather than silently dropping it (posexplode_outer)
    val rep = Quantiles.groupedQuantileReport(nulls, "g", "v", Seq(0.5), K)
      .collect().map(r => r.getString(0) -> (r.isNullAt(2), r.getLong(3))).toMap
    assert(rep.keySet === Set("a", "b"), "all-null group must not vanish")
    assert(rep("a") === ((true, 0L)))
    assert(rep("b") === ((false, 1L)))
  }

  test("k below the sketch minimum fails at PLAN time naming the aggregate") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graftnative.SketchAggregates.kllQuantiles($"v", Seq(0.5), 4)
    }
    assert(e.getMessage.contains("graft_kll_quantiles"), e.getMessage)
    // same guard on the SQL path, where k arrives as user-supplied text
    org.apache.spark.sql.graftnative.SketchAggregates.register(spark)
    df.createOrReplaceTempView("kll_k_guard")
    val sqlErr = intercept[Exception] {
      spark.sql("SELECT graft_kll_quantiles(v, 4, 0.5) FROM kll_k_guard").collect()
    }
    assert(sqlErr.getMessage.contains("graft_kll_quantiles"), sqlErr.getMessage)
  }

  test("sketch binary state round-trips exactly (the aggregate's wire format)") {
    val xs = seededData(25000)
    val s = KllSketch.fromValues(xs, K)
    val r = KllSketch.fromBytes(s.toBytes)
    assert(r.n === s.n && r.retained === s.retained && r.k === s.k)
    for (p <- Seq(0.01, 0.5, 0.99)) assert(r.quantile(p) === s.quantile(p))
    // and an un-flushed buffer (n < k) survives the trip too
    val tiny = KllSketch.fromValues(Seq(3.0, 1.0, 2.0), K)
    val t = KllSketch.fromBytes(tiny.toBytes)
    assert(t.n === 3 && t.quantile(0.5) === 2.0)
  }
}
