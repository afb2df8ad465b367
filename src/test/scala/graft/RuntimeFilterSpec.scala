package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection: on a shuffle join with a selective
  * dimension filter, Catalyst should build a bloom filter from the dim
  * side and push a `bloom_filter_might_contain` probe into the FACT
  * side's scan — at 100 TB this prunes fact rows before the shuffle,
  * which is the difference between shuffling the whole fact table and
  * shuffling the matching slice. The thresholds here are lowered because
  * the test tables are tiny; production sizes clear the defaults. */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim join injects a bloom filter on the fact side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    try {
      val p = Tables.load(spark, dir, "part").filter(col("p_name").contains("gear"))
      val l = Tables.load(spark, dir, "lineitem")
      val q = l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(q.collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }
}
