package graft

import graft.operators.{GraphOps, Maintenance, QualityChecks, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Unit coverage for the rank/concentration statistics, CUSUM change
  * point, bounded k-core peel, zone-map audit, and phrase search —
  * closed-form answers on constructed inputs (cross-engine arithmetic
  * is hash-gated by each operator's registry row; these pin SEMANTICS). */
class RankStatsSpec extends SparkSpec {

  import spark.implicits._

  test("spearmanCorr: perfect monotone is +1, perfect anti-monotone is -1") {
    // num == den up to the fixed sqrt(a)*sqrt(b) op order, so the
    // result is 1 within one ulp (never algebraically re-associated)
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 40.0))
      .toDF("x", "y")
    assert(math.abs(QualityChecks.spearmanCorr(up, "x", "y")
      .select("rho").as[Double].head() - 1.0) < 1e-12)
    val down = Seq((1.0, 40.0), (2.0, 25.0), (3.0, 20.0), (4.0, 10.0))
      .toDF("x", "y")
    assert(math.abs(QualityChecks.spearmanCorr(down, "x", "y")
      .select("rho").as[Double].head() + 1.0) < 1e-12)
  }

  test("spearmanCorr: ties get average ranks (doubled-rank identity)") {
    // x = (1,1,2) -> doubled average ranks (3,3,... ) computed over the
    // collapsed histogram; a constant axis degenerates to null rho
    val const = Seq((1.0, 5.0), (1.0, 7.0), (1.0, 9.0)).toDF("x", "y")
    val r = QualityChecks.spearmanCorr(const, "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("rho")), "zero-variance axis -> null")
  }

  test("giniConcentration: uniform is 0, single holder is (n-1)/n") {
    val eq = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 5.0)).toDF("s", "v")
    assert(QualityChecks.giniConcentration(eq, "s", "v")
      .select("gini").as[Double].head() === 0.0)
    val one = Seq(("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 8.0)).toDF("s", "v")
    assert(QualityChecks.giniConcentration(one, "s", "v")
      .select("gini").as[Double].head() === 0.75)
  }

  test("weightedMedian: cumulative weight rule on a known case") {
    // weights: 1.00x1, 2.00x2, 9.00x1 -> total 4, half reached at 2.00
    val df = Seq(("g", 1.00, 1L), ("g", 2.00, 2L), ("g", 9.00, 1L))
      .toDF("s", "v", "w")
    val r = QualityChecks.weightedMedian(df, "s", "v", "w").collect().head
    assert(r.getLong(r.fieldIndex("total_w")) === 4L)
    assert(r.getLong(r.fieldIndex("wmedian")) === 200L)
  }

  test("cusumChangePoint: injected level shift found at the boundary day") {
    // 5 events/day on days 1-5, 15/day on days 6-10: |S| peaks at day 5
    val rows = for {
      d <- 1 to 10
      i <- 1 to (if (d <= 5) 5 else 15)
    } yield ("a", d.toLong * 86400000000L + i)
    val df = rows.toDF("event_type", "us")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"))
    val r = TimeSeries.cusumChangePoint(df, "event_type", "ts").collect().head
    assert(r.getLong(r.fieldIndex("n_days")) === 10L)
    assert(r.getLong(r.fieldIndex("total")) === 100L)
    assert(r.getLong(r.fieldIndex("day_star")) === 5L)
  }

  test("kCorePeel: pendant peels off, the triangle survives at k=2") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val bi = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.kCorePeel(bi, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(GraphOps.kCorePeel(bi, k = 3, rounds = 3).count() === 0L,
      "no 3-core exists")
  }

  test("zoneMapAudit: hand-counted pruning on a 2-shard manifest") {
    val df = (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v")
    val got = Maintenance.zoneMapAudit(df, "k", "v", shardWidth = 5L,
        preds = Seq((0L, 40L), (100L, 200L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((0L, 40L)) === ((2L, 1L, 5L)), "shard 1 (v 50-90) pruned")
    assert(got((100L, 200L)) === ((2L, 2L, 0L)), "both shards pruned")
  }

  test("skippingAudit2D: z-bucketed layout prunes the 2-D box, row-id layout cannot") {
    // 16x16 grid, one row per cell; arrival id is a bijective scramble
    // (5k+3 mod 256) so arrival shards span both dims; z shards are
    // 4x4 tiles
    val grid = for (x <- 0L until 16L; y <- 0L until 16L)
      yield ((5 * (y * 16 + x) + 3) % 256, x, y)
    val df = grid.toDF("rid", "x", "y")
    val zd = df.withColumn("zkey",
      graft.operators.ZOrder.zValue(col("x"), col("y"), 4))
    val preds = Seq((0L, 3L, 0L, 3L))
    def audit(d: org.apache.spark.sql.DataFrame, shard: String, tag: String) =
      graft.operators.ZOrder.skippingAudit2D(d, expr(shard), tag, "x", "y", preds)
        .collect().head
    val lin = audit(df, "rid div 16", "linear")
    val zed = audit(zd, "zkey div 16", "zorder")
    assert(lin.getLong(lin.fieldIndex("n_pruned")) === 0L,
      "every arrival shard spans all of x")
    assert(zed.getLong(zed.fieldIndex("n_pruned")) === 15L,
      "the box is exactly one 4x4 z-tile")
    assert(zed.getLong(zed.fieldIndex("rows_scanned_bound")) === 16L)
  }

  test("phraseSearch counts overlapping occurrences") {
    val docs = Seq((1L, "a a a b"), (2L, "a b a"), (3L, "b b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L), "positions (0,1) and (1,2) in doc 1")
  }

  test("categoryCosine: proportional vectors have cosine 1.0") {
    // cat x and y seen together on every entity with 2:1 counts
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "x"), (2L, "y"))
    val r = QualityChecks.categoryCosine(rows.toDF("e", "cat"), "e", "cat")
      .collect().head
    assert(r.getString(0) === "x" && r.getString(1) === "y")
    assert(r.getLong(r.fieldIndex("dot")) === 4L)
    assert(math.abs(r.getDouble(r.fieldIndex("cos")) - 1.0) < 1e-12)
  }

  test("aucRankSum: hand-computed rank-sum AUC on interleaved labels") {
    // scores 1..4, positives at 1 and 3: U counts (3>2) only -> 1/4
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0)).toDF("score", "y")
    val r = QualityChecks.aucRankSum(df, "score", "y").collect().head
    assert(r.getDouble(r.fieldIndex("u2")) === 2.0)
    assert(r.getDouble(r.fieldIndex("auc")) === 0.25)
    val sep = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("score", "y")
    assert(QualityChecks.aucRankSum(sep, "score", "y")
      .select("auc").as[Double].head() === 1.0)
  }

  test("calibrationCurve: bucket floors and positive rates") {
    val df = Seq((0.05, 1), (0.07, 0), (0.15, 1), (-0.12, 0)).toDF("score", "y")
    val got = QualityChecks.calibrationCurve(df, "score", "y", bins = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(0L -> ((2L, 1L)), 1L -> ((1L, 1L)), -2L -> ((1L, 0L))))
  }

  test("autocorrelation: alternating series has acf(1) = -5/6, acf(2) = 2/3") {
    // daily counts 1,3,1,3,1,3: centered c = n*x - S alternates -6, +6
    val rows = for {
      d <- 1 to 6
      i <- 1 to (if (d % 2 == 1) 1 else 3)
    } yield ("a", d.toLong * 86400000000L + i)
    val df = rows.toDF("event_type", "us")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"))
    val got = TimeSeries.autocorrelation(df, "event_type", "ts", maxLag = 2)
      .collect().map(r => r.getInt(r.fieldIndex("k")) ->
        r.getDouble(r.fieldIndex("acf"))).toMap
    assert(math.abs(got(1) - (-180.0 / 216.0)) < 1e-15)
    assert(math.abs(got(2) - (144.0 / 216.0)) < 1e-15)
  }

  test("vadSegments: window count tracks n_samples, islands are consistent") {
    val docs = Seq((1L, "alpha beta gamma", 20L), (2L, "delta", 40L))
      .toDF("doc_id", "text", "n_chars")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val got = graft.operators.Multimodal.vadSegments(
        graft.operators.Multimodal.audioTable(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // n_samples = n_chars % 64 + 16 -> 36 and 56 -> ceil/8 = 5 and 7
    assert(got(1L)._1 === 5L)
    assert(got(2L)._1 === 7L)
    got.values.foreach { case (nw, nact, nseg, maxRun) =>
      assert(nact <= nw && maxRun <= nact,
        "active windows bounded by windows, longest run by active count")
      assert((nseg == 0) == (nact == 0), "segments iff active windows")
    }
  }

  test("cramersV: perfectly associated pair over observed cells") {
    // 2x2 with only the diagonal populated: observed-cell chi2 = 10,
    // V = sqrt(10 / (20 * 1)) = sqrt(0.5)
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))
    val r = QualityChecks.cramersV(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getLong(r.fieldIndex("chi2_ppb")) === 10L * 1000000000L)
    assert(math.abs(r.getDouble(r.fieldIndex("v")) - math.sqrt(0.5)) < 1e-12)
  }
}
