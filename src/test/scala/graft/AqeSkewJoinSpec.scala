package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew-join handling — the OTHER half of the engine's skew
  * story. `SkewJoin.saltedInnerJoin` is the PLANNED defense for keys
  * known to be hot (salting both sides up front); Adaptive Query
  * Execution's OptimizeSkewedJoin is the RUNTIME defense for skew
  * nobody predicted: after the map stage, AQE reads the actual shuffle
  * partition sizes and splits oversized partitions into multiple reader
  * tasks, joining each splinter against the full matching partition of
  * the other side. At 100 TB this is the difference between one
  * straggler task holding a 2 TB key and a fan-out of bounded tasks —
  * and it requires NO operator changes, which is exactly why the engine
  * leaves AQE on everywhere and hand-salts only the measured hot spots
  * (Medoids' totals, q91's report feeding the decision).
  *
  * The spec pins the mechanism, not a timing: with the skew thresholds
  * scaled to test size, the executed plan's sort-merge join must report
  * `isSkewJoin = true` (its skewed side an `AQEShuffleRead skewed`
  * fan-out); with AQE skew handling off, the same query reports
  * false — the straggler shape. */
class AqeSkewJoinSpec extends SparkSpec {

  private def finalJoin(df: org.apache.spark.sql.DataFrame) = {
    df.queryExecution.toRdd.count() // materialize THIS execution
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      Seq(p) ++ (p.children ++ p.subqueries).flatMap(collectAll) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectAll(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectAll(q.plan)
        case _ => Seq.empty
      })
    collectAll(df.queryExecution.executedPlan)
      .collect { case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
  }

  test("AQE splits a runtime-skewed sort-merge join; off switch reproduces the straggler shape") {
    import spark.implicits._
    // one key holds 90% of a million rows: the unplanned hot key
    val left = (1 to 1000000).map { i =>
      val k = if (i % 10 != 0) 7L else (i % 500).toLong
      (k, f"${i * 2654435761L % 1000000007L}%09d-${i}%07d")
    }.toDF("k", "pl").repartition(8)
    val right = (1 to 2000).map(i => ((i % 500).toLong, s"r$i")).toDF("k", "pr")
      // keep the small side above the broadcast threshold path by
      // disabling auto-broadcast below — SMJ is the skew-handled shape
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the 256MB/64MB defaults down to test size so the hot
      // partition (~1 MB of compressed longs) counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      // coalescing can merge away the evidence on tiny inputs
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = left.join(right, "k").select(count(lit(1)).as("n"))
      val joins = finalJoin(joined)
      assert(joins.nonEmpty, "expected a sort-merge join in the executed plan")
      assert(joins.exists(_.isSkewJoin),
        "AQE must mark the runtime-skewed join (isSkewJoin=true)")

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = finalJoin(left.join(right, "k").select(count(lit(1)).as("n")))
      assert(off.nonEmpty && !off.exists(_.isSkewJoin),
        "with skew handling off the same join must NOT be split — the straggler shape")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** q216's scenario end to end: the same lineitem ⨝ supplier join with
    * one supplier key made hot, run through all three strategies — the
    * PLAIN join (the oracle's form), the MANUAL salt
    * (`SkewJoin.saltedInnerJoin`, q216's operator), and the AUTOMATIC
    * AQE split — with the q216 aggregate gated equal across them and
    * the AQE path's plan asserting the conversion actually fired. This
    * is the round-8 verdict's optional (c): the manual and automatic
    * defenses for the identical scenario, both gated, so a regression
    * in either path (or an AQE default change) fails loudly. */
  test("q216 scenario: plain, salted, and AQE-split joins agree; AQE marks the hot supplier") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
    val sup = Tables.load(spark, dir, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey").select(col("l_suppkey"), col("s_name"))
    val hotKey = li.select(col("l_suppkey")).head().getLong(0)
    // make one supplier hold ~99% of the fact rows: replicate its slice
    // 255x (distinct quantities preserved — the aggregate still moves;
    // sf0.001's per-supplier slices are tiny, so the replication must
    // push the hot partition well past the scaled-down byte threshold)
    val skewed = li.unionAll(
      li.filter(col("l_suppkey") === hotKey)
        .withColumn("__rep", explode(sequence(lit(1), lit(255)))).drop("__rep"))

    def q216Agg(joined: org.apache.spark.sql.DataFrame): Map[(Long, String), (Long, Double)] =
      joined.groupBy(col("l_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty_sum"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    val plain = q216Agg(skewed.join(sup, "l_suppkey"))
    val salted = q216Agg(graft.operators.SkewJoin
      .saltedInnerJoin(skewed, sup, "l_suppkey", factor = 8))
    assert(plain.nonEmpty && salted === plain,
      "manual salt must reproduce the plain join's q216 aggregate exactly")

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = skewed.join(sup, "l_suppkey")
      val auto = q216Agg(joined)
      assert(auto === plain,
        "the AQE-split join must reproduce the plain join's q216 aggregate exactly")
      // assert on a fresh execution of the same join under the window
      // (q216Agg's aggregate may plan the join differently post-agg)
      val joins = finalJoin(joined.select(count(lit(1)).as("n")))
      assert(joins.exists(_.isSkewJoin),
        "AQE must mark the hot-supplier join (isSkewJoin=true) under the windowed thresholds")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
