package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join WITHOUT an equi key, done as a bucketed
  * equi-join — the shape that survives two large sides at 100 TB, where
  * Spark's native plan for `l.ts BETWEEN r.lo AND r.hi` is a broadcast
  * nested loop (O(|L|·|R|) comparisons).
  *
  * Both sides map onto fixed-width time buckets: a point belongs to
  * exactly ONE bucket; an interval explodes to every bucket it covers
  * (intervals are typically << bucketWidth·few, so the blowup is small
  * and bounded). The join key becomes the bucket id — a plain shuffle
  * hash join — and the BETWEEN predicate remains only as a residual
  * filter. Each (point, interval) match arises from exactly one bucket,
  * so no dedup is needed and the output EQUALS the naive range join. */
object RangeJoin {

  /** Join point rows (`ptsUs` micros column) to interval rows
    * (`loUs`/`hiUs` micros columns, inclusive) on containment.
    * Columns from both sides are kept. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptsUs: String, loUs: String, hiUs: String,
      bucketWidthUs: Long = 3600000000L): DataFrame = {
    val p = points.withColumn("_bucket", floor(col(ptsUs) / bucketWidthUs))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loUs) / bucketWidthUs), floor(col(hiUs) / bucketWidthUs))))
    p.join(iv, Seq("_bucket"))
      .filter(col(ptsUs) >= col(loUs) && col(ptsUs) <= col(hiUs))
      .drop("_bucket")
  }

  /** Interval × interval OVERLAP join (inclusive: `aLo <= bHi AND
    * bLo <= aHi`) without an equi key, as a bucketed equi-join. Both
    * sides explode to every bucket they cover; the bucket id is the join
    * key; the overlap predicate stays as a residual filter. Unlike the
    * point case, an overlapping pair shares EVERY bucket their
    * intersection covers, so the pair would emit once per shared bucket —
    * the emit-once rule keeps only the bucket containing the
    * intersection's left edge (`floor(max(aLo, bLo) / w)`), which both
    * sides provably cover, so each overlapping pair appears exactly once
    * and the output EQUALS the naive θ-join. Blowup per row is
    * `⌈span/w⌉ + 1` — bounded when interval spans are bounded, the same
    * contract every interval-join engine (e.g. the bucketed range joins
    * in Trino/Snowflake-style engines) imposes. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLoUs: String, aHiUs: String, bLoUs: String, bHiUs: String,
      bucketWidthUs: Long = 3600000000L): DataFrame = {
    val ae = a.withColumn("_bucket",
      explode(sequence(floor(col(aLoUs) / bucketWidthUs), floor(col(aHiUs) / bucketWidthUs))))
    val be = b.withColumn("_bucket",
      explode(sequence(floor(col(bLoUs) / bucketWidthUs), floor(col(bHiUs) / bucketWidthUs))))
    ae.join(be, Seq("_bucket"))
      .filter(col(aLoUs) <= col(bHiUs) && col(bLoUs) <= col(aHiUs))
      .filter(col("_bucket") === floor(greatest(col(aLoUs), col(bLoUs)) / bucketWidthUs))
      .drop("_bucket")
  }
}
