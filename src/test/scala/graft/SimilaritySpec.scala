package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Hyperplane-LSH near-dup recall against the exact brute-force baseline,
  * exhaustively on the fixed sf0.001 embeddings (the LSH output is
  * deterministic — seeded planes — so recall verified here holds for the
  * correctness gate too; see Similarity scaladoc for the analytic bound). */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("injected near-dup embeddings are true near-dups (cos ≈ 0.998+)") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val joined = aug.as("a").join(aug.as("b"),
        col("a.vec_id") + 1000000 === col("b.vec_id"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(joined.nonEmpty)
    assert(joined.forall(_ > 0.99), s"min injected cos = ${joined.min}")
  }

  test("LSH pairs == exact all-pairs cos >= 0.9 (recall 1.0 on testdata)") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
      .withColumn("norm", sqrt(Similarity.fdot(col("embedding"), col("embedding"))))
    // exact, unblocked all-pairs ground truth
    val exact = aug.as("a").join(aug.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (Similarity.fdot(col("a.embedding"), col("b.embedding"))
          / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.hyperplaneLshNearDupPairs(
        Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings")), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact,
      s"missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("semDedup keeps each near-dup group's min id, drops the rest, passes non-dups through") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val survivors = Similarity.semDedupApply(aug, 0.9)
      .collect().map(_.getLong(0)).toSet
    val all = aug.select("vec_id").collect().map(_.getLong(0)).toSet
    val copies = all.filter(_ >= 1000000)
    assert(copies.nonEmpty)
    // every injected copy pairs with its original (smaller id) -> dropped;
    // every original survives as its group's canonical
    assert(copies.forall(c => !survivors.contains(c)),
      s"copies not deduplicated: ${copies.filter(survivors.contains).take(5)}")
    assert(copies.forall(c => survivors.contains(c - 1000000)),
      "an original lost to its own copy — canonical rule broken")
    // non-dup vectors (near-orthogonal corpus) pass through untouched
    assert(survivors === all -- copies)
  }

  /** Learned-centroid IVF (q52b): recall vs the brute-force baseline on
    * TRUE near neighbors (each injected near-dup's top-1 is its original,
    * cos ≈ 0.99 — the workload ANN exists for), and the candidate cut
    * the probe buys. On near-orthogonal vectors with no true neighbor,
    * recall at nprobe/kCells of the corpus tracks the probed fraction —
    * that is the physics of IVF, not a bug — so the recall bar is pinned
    * on the near-dup queries where cell locality is real. */
  test("semanticDecontaminate: drops exactly the brute-force contaminated set; empty benchmark drops nothing") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val train = aug.filter(col("vec_id") < 1000000)
    val heldout = aug.filter(col("vec_id") >= 1000000)
    val survivors = Similarity.semanticDecontaminate(train, heldout, 0.9)
      .collect().map(_.getLong(0)).toSet
    // brute-force ground truth: cross-split cosine >= 0.9
    val n = (df: org.apache.spark.sql.DataFrame) => df.withColumn("norm",
      sqrt(Similarity.fdot(col("embedding"), col("embedding"))))
    val bad = n(train).as("a").join(n(heldout).as("b"),
        Similarity.fdot(col("a.embedding"), col("b.embedding"))
          / (col("a.norm") * col("b.norm")) >= 0.9)
      .select(col("a.vec_id")).collect().map(_.getLong(0)).toSet
    val all = train.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(bad.nonEmpty, "testdata must contain contaminated rows")
    assert(survivors === all -- bad)
    // the injected copies' originals are exactly the contaminated rows here
    assert(bad === all.filter(_ % 10 == 0))
    val none = Similarity.semanticDecontaminate(train, heldout.limit(0), 0.9)
    assert(none.count() === all.size.toLong)
  }

  test("learned IVF: recall >= 0.95 vs brute force on near-dup queries, candidates bounded") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val queries = aug.filter(col("vec_id") >= 1000000)
    val nQueries = queries.count()
    val brute = Similarity.bruteForceTopK(queries, aug, 1)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfLearnedTopK(queries, aug, 1, kCells = 8, nprobe = 2, iters = 2)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall < 0.95 (missed ${(brute -- ivf).take(5)})")

    // candidate bound: each query scores only its nprobe=2 probed cells'
    // members — with 8 learned cells that must stay well under the
    // brute-force candidate count (n per query); assert < 60% of it
    val centroids = Similarity.learnCells(aug, 8, 2)
    val cellSizes = Similarity.assignCells(aug, centroids)
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cellSizes.values.sum == aug.count())
    val fullScan = aug.count() * nQueries
    val probedUpper = 2L * cellSizes.values.max * nQueries // loose per-query bound
    assert(probedUpper < fullScan * 6 / 10,
      s"probe bound $probedUpper not < 60% of brute-force $fullScan — cells too skewed")
  }

  test("annEvalMetrics: recall and reciprocal rank, including the zero-overlap row") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "vec_id", "rank")
    val approx = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 99L, 3),
      (2L, 30L, 1), (2L, 31L, 2), (2L, 32L, 3))
      .toDF("query_id", "vec_id", "rank")
    val got = Similarity.annEvalMetrics(approx, exact, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 2.0 / 3.0, 500000L)),
      s"2 hits, true NN found at approx rank 2: $got")
    assert(got(2L) === ((0L, 0.0, 0L)), s"zero-overlap query still reports: $got")
  }

  test("pcaPowerIteration: recovers the dominant variance axis") {
    // second moment dominated by axis 3 (coords ±1 there, ±0.05 on axis
    // 7, zero elsewhere) — the scaled direction must peak at index 3 at
    // full scale, with everything else an order of magnitude below
    val rows = (1 to 40).map { i =>
      val a = Array.fill(64)(0.0f)
      a(3) = if (i % 2 == 0) 1.0f else -1.0f
      a(7) = if (i % 3 == 0) 0.05f else -0.05f
      (i.toLong, a)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val v = Similarity.pcaPowerIteration(emb)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val peak = v.maxBy { case (_, x) => math.abs(x) }
    assert(peak._1 === 3, s"principal axis must be 3: $v")
    assert(math.abs(peak._2) === 100000L, "renormalization pins the peak to +-scale")
    assert(v.filterNot(_._1 == 3).values.forall(x => math.abs(x) < 10000L),
      s"off-axis components stay an order below: $v")
  }

  test("negativeSample: k cross-label negatives per anchor, replayable, never self or same-label") {
    val emb = (0L until 20L).map(i => (i, (i % 4).toInt, Array.fill(4)(0f)))
      .toDF("vec_id", "label", "embedding")
    def run() = Similarity.negativeSample(emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val out = run()
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.keySet === (0L until 20L).toSet, "every anchor gets negatives")
    byAnchor.foreach { case (a, rows) =>
      assert(rows.length === 3 && rows.map(_._2).sorted.toSeq === Seq(1, 2, 3),
        s"anchor $a: dense ranks 1..3, got $rows")
      rows.foreach { case (_, _, neg) =>
        assert(neg !== a, s"anchor $a sampled itself")
        assert(neg % 4 !== a % 4, s"anchor $a sampled its own label: $neg")
      }
    }
    assert(run().toSeq === out.toSeq, "same input replays the same negatives")
  }

  test("ivfSemanticDecontaminate == bands form == exact cross-split (and NearestCells probe order)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val heldout = Similarity.nearDupBatch(emb)
    val ivf = Similarity.ivfSemanticDecontaminate(emb, heldout, 0.9)
      .collect().map(_.getLong(0)).toSet
    val bands = Similarity.semanticDecontaminate(emb, heldout, 0.9)
      .collect().map(_.getLong(0)).toSet
    // exact cross-split ground truth
    val n = (df: org.apache.spark.sql.DataFrame) => df.withColumn("norm",
      sqrt(Similarity.fdot(col("embedding"), col("embedding"))))
    val bad = n(emb).as("a").join(n(heldout).as("b"),
        Similarity.fdot(col("a.embedding"), col("b.embedding"))
          / (col("a.norm") * col("b.norm")) >= 0.9)
      .select(col("a.vec_id")).collect().map(_.getLong(0)).toSet
    val all = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(bad.nonEmpty)
    assert(ivf === all -- bad, "IVF cell blocking must lose no contaminated row here")
    assert(ivf === bands)

    // NearestCells returns the nprobe nearest cells in (d2, cell) order —
    // element 0 must equal NearestCell's argmin, and the probe list must
    // match sorting all cells by the fold distance
    val centroids = Similarity.learnCells(
      emb.select(col("vec_id"), col("embedding")), 8, 2)
    import org.apache.spark.sql.graftnative.VectorExpressions
    val probed = emb.limit(50).select(col("vec_id"),
        VectorExpressions.nearestCell(col("embedding"), centroids).as("c1"),
        VectorExpressions.nearestCells(col("embedding"), centroids, 3).as("cs"),
        col("embedding"))
      .collect()
    probed.foreach { r =>
      val cs = r.getAs[scala.collection.Seq[Int]]("cs")
      assert(cs.length === 3)
      assert(cs.head === r.getAs[Int]("c1"))
      val x = r.getAs[scala.collection.Seq[Float]]("embedding")
      val byDist = centroids.zipWithIndex.map { case (c, idx) =>
        (c.zip(x).map { case (ci, xi) => val d = xi.toDouble - ci; d * d }.sum, idx)
      }.sortBy(identity).take(3).map(_._2)
      assert(cs.toSeq === byDist.toSeq, s"probe order mismatch for vec ${r.getLong(0)}")
    }
  }

  test("two-level routing: total membership, kernel == reference argmin-within-group, measured agreement vs flat") {
    val emb = Tables.load(spark, dir, "embeddings")
    val fine = Similarity.learnCells(
      emb.select(col("vec_id"), col("embedding")), 8, 2)
    val (coarse, members) = Similarity.learnCoarseCells(fine, 3, Similarity.CoarseIters)
    // every fine cell in exactly one group
    assert(members.flatten.sorted === fine.indices.toList)
    // the routed result equals a from-scratch Scala replay of the
    // two-level procedure on every vector (kernel correctness), and the
    // reported coarse is the routed group
    val rows = Similarity.twoLevelRouting(emb).collect()
    val embMap = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)).toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, c)) => val d = x - c; acc + d * d }
    val kept = members.indices.filter(members(_).nonEmpty)
    rows.foreach { r =>
      val x = embMap(r.getLong(0)).toSeq
      // two probed coarse groups, argmin over their member union,
      // ties to the lower fine cell id (the CoarseProbe=2 contract)
      val probed = kept.sortBy(gi => (d2(x, coarse(gi)), gi)).take(2)
      val cand = probed.flatMap(members)
      val cell = cand.minBy(c => (d2(x, fine(c)), c))
      val g = probed.find(members(_).contains(cell)).get
      assert(r.getAs[Int]("coarse") === g, s"vec ${r.getLong(0)} routed group")
      assert(r.getAs[Int]("cell") === cell, s"vec ${r.getLong(0)} routed cell")
      // flat_cell is the exact argmin over ALL fine cells
      assert(r.getAs[Int]("flat_cell") ===
        fine.indices.minBy(c => (d2(x, fine(c)), c)))
    }
    // the approximation is measured, not assumed: at this toy scale
    // (8 cells, 3 groups) most routes still find the true nearest cell
    val agree = rows.count(r => r.getAs[Int]("cell") == r.getAs[Int]("flat_cell"))
    assert(agree.toDouble / rows.length >= 0.7,
      s"two-level agreement ${agree.toDouble / rows.length} below floor")
  }

  test("ivfSemDedup == band-form semDedup (same survivors on the injected corpus)") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val ivf = Similarity.ivfSemDedup(aug, 0.9)
      .collect().map(_.getLong(0)).toSet
    val bands = Similarity.semDedupApply(aug, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.nonEmpty && ivf.size < aug.count(), "dedup must actually remove members")
    assert(ivf === bands,
      "the IVF cell blocking must keep exactly the band form's survivors here")
  }

  test("learnCellsSampled: below the cap it is exactly learnCells; above, deterministic") {
    val emb = Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    assert(Similarity.learnCellsSampled(emb, 4, 1, cap = 1000000L)
      === Similarity.learnCells(emb, 4, 1))
    val s1 = Similarity.learnCellsSampled(emb, 4, 1, cap = 64L)
    val s2 = Similarity.learnCellsSampled(emb, 4, 1, cap = 64L)
    assert(s1 === s2, "sampled training must be deterministic")
    assert((s1 != Similarity.learnCells(emb, 4, 1)) || emb.count() <= 64)
  }

  test("nearestCellsTwoLevel: top-1 == single two-level kernel, cells within probed groups, flat agreement measured") {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val fine = Similarity.learnCells(emb, 8, 2)
    val (coarse, members) = Similarity.learnCoarseCells(fine, 3, 1)
    val kept = members.indices.filter(members(_).nonEmpty)
    val kc = kept.map(coarse)
    val km = kept.map(members)
    import org.apache.spark.sql.graftnative.VectorExpressions
    val rows = emb.select(col("vec_id"),
        VectorExpressions.nearestCellTwoLevel(col("embedding"), kc, km, fine).as("one"),
        VectorExpressions.nearestCellsTwoLevel(col("embedding"), kc, km, fine).as("two"),
        VectorExpressions.nearestCells(col("embedding"), fine, 2).as("flat"))
      .collect()
    assert(rows.nonEmpty)
    val allMembers = km.flatten.toSet
    var agree = 0
    rows.foreach { r =>
      val two = r.getAs[scala.collection.Seq[Int]]("two")
      // top-1 of the multi-probe kernel IS the single kernel's argmin
      assert(two.head === r.getAs[Int]("one"), s"vec ${r.getLong(0)}")
      assert(two.length === 2 && two(0) != two(1))
      assert(two.forall(allMembers.contains), "cell outside the member union")
      if (two.toSet == r.getAs[scala.collection.Seq[Int]]("flat").toSet) agree += 1
    }
    // approximate by design; the toy-scale agreement floor mirrors the
    // single-kernel two-level test's
    assert(agree.toDouble / rows.length >= 0.6,
      s"two-cell agreement ${agree.toDouble / rows.length} below floor")
  }

  test("ivf2SemDedup == ivfSemDedup survivors on the injected corpus (two-level membership loses no group)") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val flat = Similarity.ivfSemDedup(aug, 0.9).collect().map(_.getLong(0)).toSet
    val two = Similarity.ivf2SemDedup(aug, 0.9).collect().map(_.getLong(0)).toSet
    assert(two.nonEmpty && two.size < aug.count(), "dedup must actually remove members")
    assert(two === flat,
      "two-level-routed membership must keep exactly the flat form's survivors here")
  }

  test("cell-index staleness: same-distribution growth is clean, a drifted stream trips the rebuild signal") {
    val idx = "driftidx"
    Seq(s"${idx}_ivfcells", s"${idx}_ivfcentroids", s"${idx}_ivfcensus")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      Similarity.writeCellIndex(emb, idx)

      // fresh index: live == census by construction
      val s0 = Similarity.cellDriftStats(spark, idx)
      assert(s0.tvd === 0.0 && s0.maxGrowth === 1.0 && s0.nBuild === s0.nLive)

      // plain growth, UNCHANGED distribution: the same corpus arrives
      // again under new ids. The fixed quantizer routes each copy to the
      // cell its original lives in, every cell doubles, shares are
      // untouched — rebuilds are for drift, not size.
      Similarity.appendToCellIndex(spark,
        emb.select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")), idx)
      val s1 = Similarity.cellDriftStats(spark, idx)
      assert(s1.nLive === 2 * s1.nBuild)
      assert(s1.tvd < 1e-9, s"same-distribution growth read as drift: tvd=${s1.tvd}")
      assert(math.abs(s1.maxGrowth - 1.0) < 1e-9)
      assert(!Similarity.cellIndexStale(spark, idx))

      // drifted stream: a corpus-sized batch of ONE repeated embedding —
      // the quantizer has no cells where the new mass lives, so it all
      // lands in that vector's two nearest cells and their live share
      // inflates past what training balanced
      val one = emb.orderBy(col("vec_id")).select(col("embedding"))
        .as[Array[Float]].head()
      val n = emb.count()
      val drifted = spark.range(n)
        .select((col("id") + 3000000L).as("vec_id"), typedLit(one).as("embedding"))
      Similarity.appendToCellIndex(spark, drifted, idx)
      val s2 = Similarity.cellDriftStats(spark, idx)
      assert(s2.tvd >= 0.10,
        s"a corpus-sized single-point stream must move >=10% of probe mass, got ${s2.tvd}")
      assert(s2.maxGrowth > s1.maxGrowth)
      assert(Similarity.cellIndexStale(spark, idx), s"drifted index not flagged: $s2")

      // the report itself is cell-count-bounded and internally consistent
      val rep = Similarity.cellDriftReport(spark, idx).collect()
      assert(rep.length <= Similarity.defaultCellCount(n) + 1)
      assert(math.abs(rep.map(_.getAs[Double]("live_share")).sum - 1.0) < 1e-9)
      assert(math.abs(rep.map(_.getAs[Double]("build_share")).sum - 1.0) < 1e-9)
    } finally
      Seq(s"${idx}_ivfcells", s"${idx}_ivfcentroids", s"${idx}_ivfcensus")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
