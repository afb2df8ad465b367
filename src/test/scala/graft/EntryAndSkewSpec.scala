package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class EntryAndSkewSpec extends SparkSpec {

  test("driver contract: entry() produces per-cluster summary rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum > 0)
    assert(rows.length <= 3) // k = 3 flagship
  }

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    // hot key: 90% of the large side hits key 1
    val large = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (2L, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "name")
    val plain = large.join(small, "k")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", factor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }
}
