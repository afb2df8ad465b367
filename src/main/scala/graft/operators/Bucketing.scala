package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins.
  *
  * Writing both sides bucketed by the join key with the same bucket count
  * pins their physical layout to `HashPartitioning(key, n)`: the join
  * compiles to a sort-merge over the matching bucket files with NO
  * Exchange on either side (BucketingSpec asserts this on the plan). At
  * 100 TB this is the difference between re-shuffling the fact table per
  * query and shuffling it once at write time — the Spark-native analog of
  * the reference's manual rowkey-range sharding (`Cluster.java:66-75`).
  */
object Bucketing {

  /** Persist `df` bucketed by `key` into `n` buckets as a catalog table
    * (bucketing metadata lives in the catalog, so the path API can't
    * express it — V1 in-memory catalog suffices, no Hive needed).
    * With `path` set the table is EXTERNAL: the bucket files outlive the
    * session and can be re-attached in a fresh one via DDL over the same
    * location (see `Dedup.registerBandIndex`). */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int,
      sortKey: Option[String] = None, path: Option[String] = None): Unit = {
    val w0 = df.write.mode(SaveMode.Overwrite).bucketBy(n, key)
    val w1 = sortKey.fold(w0)(s => w0.sortBy(s))
    path.fold(w1)(p => w1.option("path", p)).saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Compaction/rewrite cycle for ONE table of an EXTERNAL bucketed
    * index: read the live FILES, apply `transform`, force the bucket
    * shuffle, write to a side directory, swap it under the stable
    * location. The read is `spark.read.parquet`, never the catalog
    * table — a catalog read carries the bucket metadata, so the planner
    * elides the repartition as already satisfied while the standalone
    * scan's tasks are file-split, not bucket-aligned, and the rewrite
    * would land task-split files again. A plain parquet read forces the
    * shuffle, whose target partition (pmod(murmur3(key), n)) IS the
    * writer's bucket id. Dropping EXTERNAL tables removes metadata
    * only, never files; the caller re-registers its DDL afterwards. */
  def rewriteExternal(spark: SparkSession, table: String, key: String,
      location: String, sub: String, buckets: Int,
      transform: DataFrame => DataFrame = identity): Unit = {
    import org.apache.spark.sql.functions.col
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(location), spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$location/$sub")
    val next = new org.apache.hadoop.fs.Path(s"$location/${sub}__compact")
    fs.delete(next, true) // stale leftover from a crashed compaction
    writeBucketed(
      transform(spark.read.parquet(live.toString)).repartition(buckets, col(key)),
      s"${table}__compact", key, buckets, sortKey = Some(key),
      path = Some(next.toString))
    spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    fs.delete(live, true)
    require(fs.rename(next, live), s"rewriteExternal: rename $next -> $live failed")
  }
}
