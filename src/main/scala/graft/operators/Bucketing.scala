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
}
