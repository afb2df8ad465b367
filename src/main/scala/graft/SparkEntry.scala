package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{KMeansConfig, TweetFeatures}
import graft.operators.KMeans
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's iterative k-medoids clustering (SURVEY §3.2)
    * end-to-end on sf0.001 — seed, assign, medoid-update, converge — then
    * the `Analysis` per-cluster summary over the final assignment. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_ENTRY_DIR", "/root/testdata/sf0.001")
    val features = Tables.eventFeatures(spark, dir).as[TweetFeatures]
    val seeds = KMeans.deterministicSeeds(features.toDF(), 3)
    val result = KMeans.run(features, KMeansConfig(k = 3, seeds = seeds))
    KMeans.assignWithFeatures(features.toDF(), result.centroids)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), avg(col("numOfHashtags")).as("avg_tags"))
  }

  private val registry: Seq[QueryDef] =
    CoreQueries.all ++ RelationalQueries.all ++ PipelineQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
