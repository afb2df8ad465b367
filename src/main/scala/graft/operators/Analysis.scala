package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Distances
import graft.model.TweetFeatures

/** Post-hoc aggregate queries over assignments + features — the
  * `Analysis.java` / `distanceCal.java` / `test.java` entry points
  * (SURVEY §3.3), each one shuffle.
  *
  * Every per-row HBase `Get` enrichment in the reference
  * (`Analysis.java:68-73`, `distanceCal.java:80-95`) becomes a single
  * equi-join (J2); Catalyst/AQE picks broadcast vs sort-merge by size.
  */
object Analysis {

  /** J2 — enrich `(id, cluster)` assignments with feature columns. */
  def enrich(assignments: DataFrame, features: DataFrame): DataFrame =
    assignments.join(features, "id")

  /** P10 — language recode: keep `en`/`tr`, else `"others"`
    * (`Analysis.java:95-97`; computed-then-unused in the reference — here a
    * first-class derivation). */
  def recodeLanguage(df: DataFrame, langCol: String = "language"): DataFrame =
    df.withColumn(langCol,
      when(col(langCol).isin("en", "tr"), col(langCol)).otherwise("others"))

  /** A5 — group count: tweets per hasVideo value
    * (`Analysis.java:98,123-136`). */
  def groupCount(enriched: DataFrame, key: String = "hasVideo"): DataFrame =
    enriched.groupBy(col(key)).agg(count(lit(1)).as("n"))

  /** A6 — per-cluster averages: the reference's declared-but-dead intent
    * (`Analysis.java:82-91,124-141`). Partial aggregation is automatic. */
  def clusterAverages(enriched: DataFrame): DataFrame =
    enriched.groupBy(col("cluster")).agg(
      avg("likeCount").as("avg_likes"),
      avg("replyCount").as("avg_replies"),
      avg("retweetCount").as("avg_retweets"),
      avg("numOfHashtags").as("avg_hashtags"),
      avg("hasVideo").as("avg_video"),
      count(lit(1)).as("n"))

  /** A2/A4 — per-cluster SSE: Σ distance(member, its cluster's fixed
    * centroid) (`distanceCal.java:75-101`; computed-and-discarded variant
    * `Cluster.java:160-186`). Centroids are k literal rows → a tiny
    * broadcast join, distance stays in codegen. */
  def clusterSse(enriched: DataFrame, centroids: Map[Int, TweetFeatures],
      hashtagWeight: Double = 0.8): DataFrame = {
    val spark = enriched.sparkSession
    import spark.implicits._
    val cents = centroids.toSeq.map { case (c, f) =>
      (c, f.time, f.numOfHashtags, f.language, f.hasVideo)
    }.toDF("cluster", "c_time", "c_tags", "c_lang", "c_video")
    val d = Distances.weightedDistance(
      col("time"), col("numOfHashtags"), col("language"), col("hasVideo"),
      col("c_time"), col("c_tags"), col("c_lang"), col("c_video"), hashtagWeight)
    enriched.join(broadcast(cents), "cluster")
      .groupBy(col("cluster")).agg(sum(d).as("sse"))
  }

  /** A7 — global sum over a column (`test.java:29-106`; the reference
    * hand-rolls map-side partials in mapper state — Spark's partial+final
    * HashAggregate does this natively). */
  def globalSum(df: DataFrame, colName: String): DataFrame =
    df.agg(sum(col(colName)).as("total"))
}
