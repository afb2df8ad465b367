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
    * express it — V1 in-memory catalog suffices, no Hive needed). */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int,
      sortKey: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(n, key)
    sortKey.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
