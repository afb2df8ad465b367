package graft

import graft.model._
import graft.operators.{KMeans, Medoids}
import org.apache.spark.sql.functions._

/** A1/A3/A8/A9 clustering kernel semantics (SURVEY §2.4, §3.2) —
  * intended-semantics versions of the reference defects (§2.8). */
class KMeansSpec extends SparkSpec {

  private def tf(id: Long, time: Int, tags: Int, lang: String, video: Int) =
    TweetFeatures(id, tags, lang, video, 0, 0, 0, time)

  private lazy val centroids = Seq(
    tf(-1, 0, 0, "en", 0), // c0 at origin
    tf(-2, 3, 0, "en", 0), // c1 at time=3
    tf(-3, 0, 10, "en", 0)) // c2 at tags=10

  test("A1: true argmin, not the reference's last-beats-first bug") {
    import spark.implicits._
    val rows = Seq(
      tf(1, 0, 0, "en", 0), // exactly c0
      tf(2, 3, 1, "en", 0), // nearest c1
      tf(3, 0, 9, "en", 0), // nearest c2
      tf(4, 2, 0, "en", 0)) // d0=2, d1=1 → c1
    val got = KMeans.assign(rows.toDF(), centroids).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("A1: first-wins tie-break is deterministic") {
    import spark.implicits._
    // equidistant between c0 (time 0) and c1 (time 3) at time... use tags
    // midpoint of c0/c2: tags=5 → d0 = 4.0, d2 = 4.0 (weight .8), tie → c0
    val got = KMeans.assign(Seq(tf(9, 0, 5, "en", 0)).toDF(), centroids)
      .collect().head.getInt(1)
    assert(got === 0)
  }

  test("A3: exact medoid on a hand-checked cluster; ties to smallest id") {
    import spark.implicits._
    // cluster 0: tags 0, 2, 10 → totals: 0:(2+10)*.8, 2:(2+8)*.8 min, 10:(10+8)*.8
    val members = Seq(
      (0, 1L, 0), (0, 2L, 2), (0, 3L, 10),
      (1, 4L, 5), (1, 5L, 5)) // tie on total → smallest id 4
      .toDF("cluster", "id", "tags")
    val got = Medoids.compute(members, "cluster", "id", Seq("tags"),
      (l, r) => abs(l("tags") - r("tags")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(0 -> 2L, 1 -> 4L))
  }

  test("A9/run: converges on well-separated clusters and recovers them") {
    import spark.implicits._
    val clusterA = (1L to 20L).map(i => tf(i, 1, 5, "en", 0))
    val clusterB = (21L to 40L).map(i => tf(i, 3, 40, "tr", 1))
    val features = spark.createDataset(clusterA ++ clusterB)
    val result = KMeans.run(features,
      KMeansConfig(k = 2, seeds = Seq(1L, 21L), maxIterations = 5))
    assert(result.converged)
    val assigns = result.assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((1L to 20L).map(assigns).toSet.size === 1)
    assert((21L to 40L).map(assigns).toSet.size === 1)
    assert(assigns(1L) !== assigns(21L))
    // medoid centroids are members
    assert(result.centroids.forall(c => (1L to 40L).contains(c.id)))
  }

  test("Mean strategy produces non-member centroids and still partitions") {
    import spark.implicits._
    val clusterA = (1L to 10L).map(i => tf(i, 1, 5, "en", 0))
    val clusterB = (11L to 20L).map(i => tf(i, 3, 40, "tr", 1))
    val features = spark.createDataset(clusterA ++ clusterB)
    val result = KMeans.run(features,
      KMeansConfig(k = 2, seeds = Seq(1L, 11L), strategy = Mean, maxIterations = 5))
    assert(result.converged)
    assert(result.centroids.map(_.id).forall(_ < 0)) // synthetic ids
  }

  test("A8: deterministic seeds are replayable and distinct") {
    import spark.implicits._
    val df = (1L to 100L).map(i => tf(i, 0, i.toInt, "en", 0)).toDF()
    val s1 = KMeans.deterministicSeeds(df, 5)
    val s2 = KMeans.deterministicSeeds(df, 5)
    assert(s1 === s2)
    assert(s1.distinct.size === 5)
    val r1 = KMeans.randomSeeds(df, 5, 0.6, seed = 7L)
    val r2 = KMeans.randomSeeds(df, 5, 0.6, seed = 7L)
    assert(r1 === r2)
  }

  test("golden: flagship run on sf0.001 eventFeatures is bit-stable") {
    import spark.implicits._
    val features = Tables.eventFeatures(spark, "/root/testdata/sf0.001").as[TweetFeatures]
    val seeds = KMeans.deterministicSeeds(features.toDF(), 3)
    assert(seeds === Seq(0L, 327L, 654L))
    val r = KMeans.run(features, KMeansConfig(k = 3, seeds = seeds))
    assert(r.iterations === 4 && r.converged)
    assert(r.centroids.map(_.id) === Seq(563L, 659L, 365L))
    val counts = r.assignments.groupBy("cluster").count().collect()
      .map(row => row.getInt(0) -> row.getLong(1)).sortBy(_._1).toSeq
    assert(counts === Seq(0 -> 263L, 1 -> 434L, 2 -> 303L))
  }

  test("sampled medoid equals exact medoid when sample covers the cluster") {
    import spark.implicits._
    val members = KMeans.assignWithFeatures(
      spark.createDataset((1L to 15L).map(i => tf(i, (i % 4).toInt, i.toInt % 7, "en", 0))).toDF(),
      centroids)
    val exact = KMeans.medoids(members).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sampled = KMeans.sampledMedoids(members, sampleSize = 1000).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exact === sampled)
  }
}
