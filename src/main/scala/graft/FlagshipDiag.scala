package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{KMeansConfig, SampledMedoid}
import graft.operators.KMeans

/** Stage-split timing for the flagship k-medoids loop (q00) — the
  * diagnostic behind SCALING.md's top-octave analysis (round-10 verdict
  * #4: the 16→64 wall step read 0.93 while the full span read 0.53;
  * name the stage). Runs each stage of ONE iteration in isolation on
  * `SPARK_GRAFT_SF_DIR`, reps = 2, min wall per stage:
  *
  *   scan+cache — the features scan and cache materialization;
  *   assign     — nearest-centroid argmin over the cached features;
  *   window     — the per-cluster candidate pre-filter
  *                (row_number ≤ s; WindowGroupLimit k-bounds its
  *                shuffle, so this should stay flat);
  *   medoid     — the candidates × members salted scoring join
  *                (O(n·s·k) distance folds — the linear-work term that
  *                must dominate at scale).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.FlagshipDiag
  * Prints one JSON line per stage. */
object FlagshipDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftRuntime.enable(spark)
    import spark.implicits._

    val features = Tables.eventFeatures(spark, dir).as[graft.model.TweetFeatures]
    val df = features.toDF()
    df.cache()
    def time(name: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, n) = runs.minBy(_._1)
      println(f"""{"stage":"$name","sec":$sec%.3f,"rows":$n}""")
    }
    time("scan_cache") { df.unpersist(true); df.cache(); df.count() }
    val seeds = KMeans.deterministicSeeds(df, 3)
    val centroids = KMeans.resolveCentroids(features, seeds)
    val cfg = KMeansConfig(k = 3, seeds = seeds, maxIterations = 2,
      strategy = SampledMedoid(256))
    val members = KMeans.assignWithFeatures(df, centroids, cfg.hashtagWeight)
    time("assign") {
      members.write.format("noop").mode("overwrite").save(); members.count()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(pmod(pmod(col("id"), lit(1000000007L)) * lit(2654435761L % 1000000007L),
        lit(1000000007L)), col("id"))
    val candidates = members.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 256).drop("rn")
    time("window_candidates") {
      candidates.write.format("noop").mode("overwrite").save(); candidates.count()
    }
    val medoid = graft.operators.Medoids.compute(candidates, members, "cluster",
      "id", Seq("time", "numOfHashtags", "language", "hasVideo"),
      (l, r) => graft.functions.Distances.weightedDistance(
        l("time"), l("numOfHashtags"), l("language"), l("hasVideo"),
        r("time"), r("numOfHashtags"), r("language"), r("hasVideo"),
        cfg.hashtagWeight),
      saltBuckets = 8)
    time("medoid") { medoid.count() }
    time("full_iteration") {
      val m2 = KMeans.assignWithFeatures(df, centroids, cfg.hashtagWeight)
      graft.operators.Medoids.compute(
        m2.withColumn("rn", row_number().over(w)).filter(col("rn") <= 256).drop("rn"),
        m2, "cluster", "id", Seq("time", "numOfHashtags", "language", "hasVideo"),
        (l, r) => graft.functions.Distances.weightedDistance(
          l("time"), l("numOfHashtags"), l("language"), l("hasVideo"),
          r("time"), r("numOfHashtags"), r("language"), r("hasVideo"),
          cfg.hashtagWeight),
        saltBuckets = 8).count()
    }
    spark.stop()
  }
}
