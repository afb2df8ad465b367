package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Distances
import graft.model._

/** Iterative k-medoids clustering — the reference's flagship query
  * (`Cluster.java:280-389` and its k∈{2,4,5} clones), re-expressed as one
  * driver loop over cached features.
  *
  * Structural change vs the reference (SURVEY §3.2): the per-row HBase
  * chatter (k point-`Get`s per scanned row in the assign mapper, 1 per value
  * in reducers, O(n²) in the medoid reducer) collapses into
  *   - assignment: a zero-shuffle narrow map over the feature table with the
  *     k centroids inlined as literals (k ≤ 5 — cheaper than a broadcast
  *     join, and fully inside whole-stage codegen);
  *   - medoid update: ONE shuffle on the cluster key (self-join + partial
  *     aggregation) instead of n² RPCs.
  *
  * Deviations from reference defects, all per SURVEY §2.8: true argmin
  * (ref. never updates `minDistance`, `Cluster.java:109-115`), true medoid
  * (ref. double-iterates a single-pass MR iterator, `Cluster.java:237-257`),
  * centroids travel driver-side via `collect()` (ref. smuggles them through
  * task `Configuration`, `Cluster.java:269-277` — broken on a real cluster).
  */
object KMeans {

  final case class Result(
      assignments: DataFrame, // (id LONG, cluster INT)
      centroids: Seq[TweetFeatures],
      iterations: Int,
      converged: Boolean,
      trajectory: Seq[Seq[TweetFeatures]]) // centroids per iteration, for golden tests

  private val featureCols = Seq("id", "numOfHashtags", "language", "hasVideo",
    "replyCount", "retweetCount", "likeCount", "time")

  /** Distance of each row's features to one centroid, as a codegen'd
    * column expression (J1 with k literal rows — no join needed). */
  private def distTo(c: TweetFeatures, hw: Double): Column =
    Distances.weightedDistance(
      col("time"), col("numOfHashtags"), col("language"), col("hasVideo"),
      lit(c.time), lit(c.numOfHashtags), lit(c.language), lit(c.hasVideo), hw)

  /** A1 — nearest-centroid assignment: first index achieving the minimum
    * distance (first-wins ties, deterministic). Narrow: no shuffle, no UDF.
    * Keeps the feature columns so the downstream medoid update needs no
    * re-join (the reference instead re-fetched every row from HBase,
    * `Cluster.java:171-177`). */
  def assignWithFeatures(features: DataFrame, centroids: Seq[TweetFeatures],
      hashtagWeight: Double = 0.8): DataFrame = {
    val dArr = array(centroids.map(distTo(_, hashtagWeight)): _*)
    features.select(
      (array_position(dArr, array_min(dArr)) - 1).cast("int").as("cluster") +:
        featureCols.map(col): _*)
  }

  /** Assignment pairs only — the reference's inter-job TSV shape. */
  def assign(features: DataFrame, centroids: Seq[TweetFeatures],
      hashtagWeight: Double = 0.8): DataFrame =
    assignWithFeatures(features, centroids, hashtagWeight).select("id", "cluster")

  /** A3 — exact medoid per cluster: the member minimizing the sum of
    * distances to all co-members; ties break to the smallest id
    * (deterministic; the MR reference's tie behavior is undefined).
    *
    * Relational formulation: self-join on the cluster key, partial-agg the
    * pairwise distances (map-side combine is automatic), then `min_by` per
    * cluster. O(Σ n_c²) compute but only ONE shuffle; for clusters too large
    * for n², use [[SampledMedoid]] or [[Mean]] via [[updateCentroids]].
    */
  def medoids(members: DataFrame, hashtagWeight: Double = 0.8): DataFrame =
    medoidOf(members, members, hashtagWeight)

  private def tweetDist(hw: Double)(l: String => Column, r: String => Column): Column =
    Distances.weightedDistance(
      l("time"), l("numOfHashtags"), l("language"), l("hasVideo"),
      r("time"), r("numOfHashtags"), r("language"), r("hasVideo"), hw)

  private def medoidOf(candidates: DataFrame, members: DataFrame, hw: Double,
      saltBuckets: Int = 1): DataFrame =
    Medoids.compute(candidates, members, "cluster", "id",
      Seq("time", "numOfHashtags", "language", "hasVideo"), tweetDist(hw), saltBuckets)

  /** The multiplicative-hash ordering key, factored through pmod so it
    * cannot overflow at ANY long id: (id·2654435761) mod P computed as
    * ((id mod P)·(2654435761 mod P)) mod P — identical values by modular
    * arithmetic (every oracle replaying the unreduced product in 128-bit
    * still matches), but the unreduced Column form threw
    * ARITHMETIC_OVERFLOW under ANSI mode once ids reached the ×64
    * replica range (~8.8e9 · 2.65e9 > Long.Max) — caught by the q00
    * scaling run, invisible at oracle scales. */
  private def seedHashOrder: Column =
    pmod(pmod(col("id"), lit(1000000007L)) * lit(2654435761L % 1000000007L),
      lit(1000000007L))

  /** A3 at scale — medoid over a deterministic candidate subset (id-hash
    * order), each candidate still scored against ALL members: O(n·s).
    * Salted 8 ways so a small k can't starve the cluster (Medoids
    * scaladoc): the scale strategy should itself scale. */
  def sampledMedoids(members: DataFrame, sampleSize: Int,
      hashtagWeight: Double = 0.8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(seedHashOrder, col("id"))
    val candidates = members
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= sampleSize)
      .drop("rn")
    medoidOf(candidates, members, hashtagWeight, saltBuckets = 8)
  }

  /** [[meanCentroids]] resolved to synthetic TweetFeatures rows
    * (id = −(cluster+1); integer feature fields rounded — the form the
    * iterative loop carries between rounds). Driver-side: k rows. */
  def meanCentroidFeatures(members: DataFrame): Map[Int, TweetFeatures] =
    meanCentroids(members)
      .collect().map { r =>
        r.getAs[Int]("cluster") -> TweetFeatures(
          id = -(r.getAs[Int]("cluster") + 1L),
          numOfHashtags = math.round(r.getAs[Double]("numOfHashtags")).toInt,
          language = r.getAs[String]("language"),
          hasVideo = math.round(r.getAs[Double]("hasVideo")).toInt,
          replyCount = math.round(r.getAs[Double]("replyCount")).toInt,
          retweetCount = math.round(r.getAs[Double]("retweetCount")).toInt,
          likeCount = math.round(r.getAs[Double]("likeCount")).toInt,
          time = math.round(r.getAs[Double]("time")).toInt)
      }.toMap

  /** Mean-centroid alternative (non-member centroid; language = per-cluster
    * mode, ties to lexicographically smallest). O(n), one shuffle. */
  def meanCentroids(members: DataFrame): DataFrame = {
    val langMode = members.groupBy(col("cluster"), col("language")).count()
      .groupBy(col("cluster"))
      .agg(min_by(col("language"), struct(-col("count"), col("language"))).as("language"))
    members.groupBy(col("cluster")).agg(
      avg("time").as("time"), avg("numOfHashtags").as("numOfHashtags"),
      avg("hasVideo").as("hasVideo"), avg("replyCount").as("replyCount"),
      avg("retweetCount").as("retweetCount"), avg("likeCount").as("likeCount"))
      .join(langMode, "cluster")
  }

  /** J3 — resolve seed/centroid ids to feature rows, preserving seed order
    * as the cluster index (`Cluster.java:353-370`). */
  def resolveCentroids(features: Dataset[TweetFeatures], ids: Seq[Long]): Seq[TweetFeatures] = {
    val byId = features.filter(col("id").isin(ids: _*)).collect()
      .map(f => f.id -> f).toMap
    ids.map(id => byId.getOrElse(id,
      throw new IllegalArgumentException(s"seed id $id not found in features")))
  }

  /** One centroid-update round: medoid/sampled-medoid strategies yield
    * member ids to resolve; Mean yields synthetic (non-member) centroids
    * with id = -(cluster+1). Empty clusters keep their previous centroid. */
  private def updateCentroids(members: DataFrame, features: Dataset[TweetFeatures],
      prev: Seq[TweetFeatures], cfg: KMeansConfig): Seq[TweetFeatures] =
    cfg.strategy match {
      case Mean =>
        val rows = meanCentroidFeatures(members)
        prev.indices.map(i => rows.getOrElse(i, prev(i)))
      case _ =>
        val medoidDf = cfg.strategy match {
          case SampledMedoid(s) => sampledMedoids(members, s, cfg.hashtagWeight)
          case _ => medoids(members, cfg.hashtagWeight)
        }
        // resolve the medoid ids to feature rows INSIDE the same job (one
        // broadcast join over the cached features) instead of a second
        // isin-filter action per iteration
        import features.sparkSession.implicits._
        val resolved = features.toDF()
          .join(broadcast(medoidDf), col("id") === col("medoid_id"))
          .select(col("cluster"), struct(featureCols.map(col): _*).as("f"))
          .as[(Int, TweetFeatures)]
          .collect().toMap
        prev.indices.map(i => resolved.getOrElse(i, prev(i)))
    }

  /** The full iterative loop (§3.2): assign → update centroids → converge?
    * Features are cached across iterations (the reference re-scans HBase
    * every iteration); the convergence test (A9) runs driver-side on the
    * k collected centroids against `cfg.convergenceLimit`.
    */
  def run(features: Dataset[TweetFeatures], cfg: KMeansConfig): Result = {
    val spark = features.sparkSession
    val df = features.toDF()
    df.cache()
    try {
      val seedIds = if (cfg.seeds.nonEmpty) cfg.seeds else deterministicSeeds(df, cfg.k)
      var centroids = resolveCentroids(features, seedIds)
      val trajectory = scala.collection.mutable.ArrayBuffer[Seq[TweetFeatures]](centroids)
      var iter = 0
      var converged = false
      while (iter < cfg.maxIterations && !converged) {
        val members = assignWithFeatures(df, centroids, cfg.hashtagWeight)
        val next = updateCentroids(members, features, centroids, cfg)
        converged = centroids.zip(next).forall { case (a, b) =>
          Distances.weightedDistance(a, b, cfg.hashtagWeight) <= cfg.convergenceLimit
        }
        centroids = next
        trajectory += centroids
        iter += 1
      }
      val finalAssign = assign(df, centroids, cfg.hashtagWeight)
      Result(finalAssign, centroids, iter, converged, trajectory.toSeq)
    } finally df.unpersist()
  }

  /** A8 replacement for unseeded sampling: deterministic k distinct seed ids
    * by multiplicative-hash order (replayable, unlike `random.java:41,81`). */
  def deterministicSeeds(features: DataFrame, k: Int): Seq[Long] =
    features.select(col("id"))
      .orderBy(seedHashOrder, col("id"))
      .limit(k).collect().map(_.getLong(0)).toSeq

  /** A8 — seeded random k-sample of distinct ids (`random.java:29-118`,
    * with the early-return and unseeded-Random defects fixed per §2.8.3).
    * Retries with a doubled fraction (up to 3×) if the Bernoulli sample
    * undershoots k, then fails HERE — not rows later in KMeansConfig's
    * `seeds.size == k` require, far from the cause. */
  def randomSeeds(features: DataFrame, k: Int, fraction: Double, seed: Long): Seq[Long] = {
    val distinct = features.select(col("id")).dropDuplicates("id")
    var f = fraction
    var ids = Seq.empty[Long]
    var attempts = 0
    while (ids.size < k && attempts < 3) {
      ids = distinct.sample(withReplacement = false, math.min(f, 1.0), seed)
        .limit(k).collect().map(_.getLong(0)).toSeq
      f *= 2
      attempts += 1
    }
    require(ids.size == k,
      s"randomSeeds: sample yielded ${ids.size} of $k requested ids " +
        s"(fraction $fraction tripled to ${f / 2}); table too small?")
    ids
  }
}
