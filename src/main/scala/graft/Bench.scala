package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.KMeansConfig
import graft.operators.KMeans

/** Benchmark main: times every registry query plus the flagship iterative
  * k-medoids loop at `SPARK_GRAFT_SF_DIR`, printing ONE JSON line.
  *
  * Noise control (single-run totals on a contended sandbox are dominated
  * by outliers that move between runs — measured in round 1):
  *   - each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3) and
  *     reports the per-query MEDIAN; `value` = Σ medians;
  *   - an untimed warmup query absorbs JIT/codegen/parquet-footer cold
  *     start before the first timed query;
  *   - the sink is `noop` format, which materializes every row of the
  *     full plan (a `count()` action would let Catalyst prune terminal
  *     projections — flattering but dishonest).
  * `min_total` (Σ per-query minima) is also reported: it is the better
  * cross-machine comparison number because per-query minima approximate
  * the contention-free cost.
  */
object Bench {

  /** Flagship loop, bench-shaped: the reference's iterative k-medoids
    * (assign → medoid update → converge, `Cluster.java:280-389`) with
    * k=3 and 2 update rounds at the bench scale factor. The returned
    * final-assignment summary is noop-written by the harness like every
    * other row; the iterations themselves run inside the timed call.
    *
    * Centroid strategy is the engine's documented SCALE path
    * (`SampledMedoid`): k=3 over the sf0.1 feature table leaves ~50k-row
    * clusters, where the reference's exact O(n²)-per-cluster medoid is a
    * 20+ minute single-task straggler (3 clusters = 3 tasks — the
    * partition-starved shape `Model.scala` documents as the reason the
    * strategy exists). 256 deterministic candidates × all members keeps
    * the update O(n·s), fully parallel, and the medoid still exact w.r.t.
    * the candidate set. */
  def flagshipKMedoids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val features = Tables.eventFeatures(spark, dir).as[graft.model.TweetFeatures]
    val seeds = KMeans.deterministicSeeds(features.toDF(), 3)
    val result = KMeans.run(features,
      KMeansConfig(k = 3, seeds = seeds, maxIterations = 2,
        strategy = graft.model.SampledMedoid(256)))
    result.assignments.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // floor at 3: with n=2 the reported "median" is the worse run, and a
    // single contended rep can't be told apart from a real regression
    val reps = math.max(3, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftRuntime.enable(spark)
    // untimed warmup: JIT + codegen + parquet footer caches
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // optional comma-separated prefix filter for local iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY=q46,q48 — the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val benchQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
      (SparkEntry.queries.toSeq ++ Seq("q00_flagship_kmedoids" -> (flagshipKMedoids _)))
        .sortBy(_._1)
        .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }

    def timeOnce(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e") }
      (System.nanoTime() - t0) / 1e9
    }

    val results = benchQueries.map { case (name, fn) =>
      val runs = (1 to reps).map(_ => timeOnce(name, fn)).sorted
      val median = runs(runs.size / 2)
      System.err.println(f"[bench] $name median $median%.2f s  runs ${runs.map(r => f"$r%.2f").mkString("/")}")
      (name, median, runs.head)
    }
    val qs = results.map { case (k, med, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val minTotal = results.map(_._3).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"min_total":$minTotal,"queries":$qs,"sf":"$sfDir"}"""
    // durability against log-tail truncation (round 2 lost q00-q03 from the
    // captured artifact): persist the line to a file first, stop Spark so
    // its shutdown chatter precedes the payload, then print the JSON as the
    // very last line of both stdout and stderr
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
    println(json)
    System.out.flush()
    System.err.println(json)
  }
}
