package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.SketchAggregates

/** The Misra–Gries aggregate must keep every true heavy hitter through
  * partial aggregation + merges, and the exact re-count pass must turn
  * the candidate superset into exactly the true heavy-hitter set. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("MG candidates contain every item with freq > n/k across merges") {
    // 10k values over 64 partitions: item 1 at ~40%, item 2 at ~15%,
    // long tail over 500 ids — k=5 keeps at most 4 counters per buffer
    val rnd = new scala.util.Random(11L)
    val data = (1 to 10000).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.40) 1L else if (r < 0.55) 2L else 3L + rnd.nextInt(500)
    }
    val df = data.toDF("wh").repartition(64)
    val cands = df.agg(SketchAggregates.misraGries(col("wh"), 5).as("c"))
      .collect()(0).getSeq[Long](0).toSet
    assert(cands.size <= 4)
    assert(cands.contains(1L) && cands.contains(2L),
      s"true heavy hitters evicted: $cands")
  }

  test("heavyHitters returns exactly the true frequency > n/k set") {
    // text corpus shaped so 'aa' (50%) and 'bb' (30%) beat n/4, the rest
    // never do; vocabulary (12) exceeds the counter budget (3)
    val words = Seq.fill(50)("aa") ++ Seq.fill(30)("bb") ++
      (0 until 20).map(i => s"t$i" * 1 + (i % 10))
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "s") }.toSeq
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.heavyHitters(docs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // exact expectation computed independently
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = words.size
    def ph(s: String): Long =
      s.codePoints.toArray.map(_.toLong).reduceLeft((a, c) => (a * 31 + c) % 1000000007L)
    val want = counts.collect { case (w, c) if c * 4 > n => ph(w) -> c }.toMap
    assert(want.nonEmpty && got === want)
  }

  test("hllSketchRollup: merged daily sketches equal the direct sketch") {
    import spark.implicits._
    import graft.operators.QualityChecks
    val rows = (1 to 3000).map(i => ("t", i.toLong % 7, (i % 900).toLong))
    val df = rows.toDF("g", "day", "uid")
    val direct = QualityChecks.hllDistinct(df, "g", "uid")
      .collect().map(r => (r.getInt(1), r.getDouble(2))).head
    val rolled = QualityChecks.hllSketchRollup(df, "g", "day", "uid")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).head
    assert(rolled._1 === 7L, "one sketch per day merged")
    assert((rolled._2, rolled._3) === direct,
      "register-wise max merge is lossless: rollup == direct sketch")
  }

  test("bounded-shuffle gate: aggregate form and WindowGroupLimit'd window both bound shuffle; naive window does not") {
    // Wall time cannot differentiate the forms at test sizes (see
    // SCALING.md), but shuffle VOLUME is size-independent evidence.
    // Measuring it surfaced a Catalyst fact worth pinning: on this
    // Spark, `rank() <= k` window filters get the WindowGroupLimit
    // pushdown — each map partition pre-filters to its local top-k
    // BEFORE the exchange, so the optimized window form's shuffle is
    // k-bounded too (not "every row", as a 3.x-era reading would
    // claim). The gate therefore pins all three regimes: the naive
    // window (pushdown disabled) ships the whole table; the optimized
    // window and the TopKAgg form both stay bounded and comparable.
    // The aggregate's residual edge is CPU shape (k-entry heap vs full
    // local sort per partition) and applicability beyond rank-filter
    // patterns — not shuffle bytes; this test documents exactly that.
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val docs = (1 to 60000).map { i =>
      (i.toLong, s"s${i % 4}", rnd.alphanumeric.take(60).mkString)
    }.toDF("doc_id", "stratum", "text").repartition(16)
    docs.cache().count()
    val limitKey = "spark.sql.optimizer.windowGroupLimitThreshold"
    val prior = spark.conf.get(limitKey)
    try {
      def shuffleBytes(df: org.apache.spark.sql.DataFrame): Long = {
        // materialize THIS queryExecution (df.write would plan a fresh
        // one, leaving these metric accumulators untouched)
        df.queryExecution.toRdd.count()
        def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
          Seq(p) ++ (p.children ++ p.subqueries).flatMap(collectAll) ++ (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              collectAll(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              collectAll(q.plan)
            case _ => Seq.empty
          })
        collectAll(df.queryExecution.executedPlan)
          .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L) }
          .sum
      }
      spark.conf.set(limitKey, "-1")
      val naive = shuffleBytes(
        graft.operators.TextAnalysis.stratifiedSample(docs, "stratum", 10))
      spark.conf.set(limitKey, prior)
      val win = shuffleBytes(
        graft.operators.TextAnalysis.stratifiedSample(docs, "stratum", 10))
      val agg = shuffleBytes(
        graft.operators.TextAnalysis.stratifiedSampleAgg(docs, "stratum", 10))
      info(s"shuffle bytes: naive window=$naive, window-group-limit=$win, aggregate=$agg")
      assert(naive > 0 && win > 0 && agg > 0,
        s"all three must have measured exchanges ($naive / $win / $agg)")
      assert(win * 5 < naive && agg * 5 < naive,
        s"bounded forms must ship <1/5 of the naive window's bytes (naive=$naive win=$win agg=$agg)")
      assert(agg < win * 3 && win < agg * 3,
        s"optimized window and aggregate should be comparable (win=$win agg=$agg)")
    } finally { spark.conf.set(limitKey, prior); docs.unpersist() }
  }

  test("stratifiedSampleAgg: bounded aggregate == window form, row for row") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val win = rows(TextAnalysis.stratifiedSample(docs, "lang", 7))
    val agg = rows(TextAnalysis.stratifiedSampleAgg(docs, "lang", 7))
    assert(agg === win, "same docs, same strata, same ranks")
    assert(agg.nonEmpty)
  }

  test("hllOverlapMatrix: union est == direct sketch of the union; inclusion-exclusion tracks truth") {
    import spark.implicits._
    import graft.operators.QualityChecks
    // A = {0..899}, B = {600..1499}: true overlap 300 of 1500
    val rows = (1 to 4000).flatMap { i =>
      Seq(("a", (i % 900).toLong), ("b", (600 + i % 900).toLong))
    }
    val df = rows.toDF("g", "uid")
    val out = QualityChecks.hllOverlapMatrix(df, "g", "uid").collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === ("a", "b"))
    val (estA, estB, estU, estI) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // register-wise max merge is lossless: the merged-union estimate is
    // BIT-IDENTICAL to sketching the union's raw rows directly
    val direct = QualityChecks.hllDistinct(
      df.select(lit("u").as("g"), col("uid")), "g", "uid")
      .collect().head.getDouble(2)
    assert(estU === direct, "merged union sketch == direct union sketch")
    assert(estI === estA + estB - estU)
    // 64-register HLL: ~13% standard error; assert within 3 sigma
    def within(est: Double, truth: Double) =
      math.abs(est - truth) <= 0.4 * truth
    assert(within(estA, 900) && within(estB, 900) &&
      within(estU, 1500), s"ests ($estA, $estB, $estU)")
  }

  test("sketch aggregates reach spark.sql text: SQL names == Column API") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => ((i % 4).toLong, (i % (50 + 10 * (i % 4))).toLong,
      (i % 977).toDouble))
    rows.toDF("g", "item", "v").createOrReplaceTempView("sketch_in")
    // topk is exact and deterministic: full equality
    val sqlTop = spark.sql(
      "SELECT g, graft_topk(item, item, 5) AS t FROM sketch_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))).toMap
    val apiTop = rows.toDF("g", "item", "v").groupBy($"g")
      .agg(org.apache.spark.sql.graftnative.SketchAggregates.topK($"item", $"item", 5).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))).toMap
    assert(sqlTop === apiTop && sqlTop.nonEmpty)
    // misra-gries: the guarantee is about heavy items (freq > n/k) —
    // the dominant item must be present in the SQL-built candidates
    (1 to 900).map(i => if (i % 3 == 0) (i % 40).toLong else 42L)
      .toDF("item").createOrReplaceTempView("mg_in")
    val sqlMg = spark.sql(
      "SELECT graft_misra_gries(item, 8) AS c FROM mg_in")
      .collect().head.getSeq[Long](0)
    assert(sqlMg.contains(42L), s"dominant item must survive: $sqlMg")
    // kll: SQL form parses, returns one estimate per requested p, and
    // the estimate respects the rank bound
    val est = spark.sql(
      "SELECT g, graft_kll_quantiles(v, 128, 0.5, 0.9) AS q FROM sketch_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(est.length === 4 && est.forall(_._2.size == 2))
    // non-literal k must be rejected loudly, not mis-sized silently
    val err = intercept[Exception] {
      spark.sql("SELECT graft_topk(item, item, item) FROM sketch_in").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("topK aggregate: exact rank order, ties broken by id, k-bounded merges") {
    import spark.implicits._
    import org.apache.spark.sql.graftnative.SketchAggregates
    // 2 partitions force partial buffers + a merge; ties on v=50
    val df = spark.sparkContext.parallelize(Seq(
      ("g", 50L, 7L), ("g", 50L, 3L), ("g", 90L, 1L), ("g", 10L, 9L),
      ("g", 70L, 2L), ("g", 50L, 5L), ("h", 5L, 1L)), 2)
      .toDF("g", "v", "id")
    val out = df.groupBy($"g")
      .agg(SketchAggregates.topK($"v", $"id", 3).as("tk"))
      .select($"g", org.apache.spark.sql.functions.posexplode($"tk"))
      .select($"g", $"pos", $"col.v", $"col.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val g = out.filter(_._1 == "g").sortBy(_._2)
    assert(g.map(t => (t._3, t._4)).toSeq === Seq((90L, 1L), (70L, 2L), (50L, 3L)),
      "rank order v desc, tie id asc, truncated at k")
    assert(out.filter(_._1 == "h").map(t => (t._3, t._4)).toSeq === Seq((5L, 1L)),
      "group smaller than k emits what it has")
  }
}
