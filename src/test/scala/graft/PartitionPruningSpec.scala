package graft

import org.apache.spark.sql.functions._

/** Partition pruning over a hive-layout table: a filter on the partition
  * column must become a PartitionFilter (directory-level pruning — the
  * scan never lists, opens, or reads the other partitions), not a row
  * filter. At 100 TB partitioning on coarse keys (source, date) is the
  * first line of defense before row-group stats and bloom filters. */
class PartitionPruningSpec extends SparkSpec {

  test("source filter prunes partitions at the scan, not rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .write.partitionBy("source").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("source") === "src1")
    val scan = q.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("PartitionFilters: [isnotnull(source"),
      s"source predicate did not become a PartitionFilter:\n$scan")
    // the pruned scan still returns exactly the partition's rows
    val expected = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("source") === "src1").count()
    assert(q.count() === expected && expected > 0)
  }
}
