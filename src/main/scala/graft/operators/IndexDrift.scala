package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared drift-census core behind every persisted index's
  * staleness signal — cell ([[Similarity.cellDriftReport]]), text band
  * ([[Dedup.bandDriftReport]]) and embedding sign-band
  * ([[Similarity.embDriftReport]]) tiers all compare LIVE per-partition
  * populations against a BUILD-time census with share-relative
  * thresholds, and the arithmetic is identical; only what a
  * "partition" is differs (a learned cell vs a fixed hash partition of
  * the routing-key space). One implementation keeps the three tiers'
  * thresholds and semantics from drifting apart.
  *
  * Share-relativity is the design invariant: plain corpus growth with
  * an UNCHANGED distribution multiplies every partition count by the
  * same factor, so shares — and therefore TVD and growth — are
  * untouched; rebuild signals fire on DRIFT, never on size. */
private[graft] object IndexDrift {

  /** Fixed partition count for the key-space censuses (band / emb-band
    * tiers; the cell tier's partitions are the learned cells
    * themselves). Bounded — the census is census-sized, never
    * corpus-sized — yet far above any band count, so a drifted stream
    * concentrating into its own few key regions always registers. */
  val CensusBuckets: Int = 1024

  /** The census partition of one routing key: a FIXED hash, so the
    * census distribution is a property of the data alone (identical
    * input → identical key → identical partition — what makes shares
    * invariant under same-distribution growth). */
  def censusBucket(key: Column): Column =
    pmod(xxhash64(key), lit(CensusBuckets.toLong))

  /** Build-vs-live drift report. `live` is (partCol, n_live), `build`
    * (partCol, n_build); both bounded (≤ partition count). Output:
    * (partCol, n_build, n_live, build_share, live_share, growth),
    * ordered by partCol. Full outer: tombstone rewrites can empty
    * either side of any partition. */
  def report(live: DataFrame, build: DataFrame, partCol: String): DataFrame = {
    val joined = live.join(build, Seq(partCol), "full_outer")
      .select(col(partCol),
        coalesce(col("n_build"), lit(0L)).as("n_build"),
        coalesce(col("n_live"), lit(0L)).as("n_live"))
    // bounded single-partition window: ≤ CensusBuckets (or kCells) rows
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    joined
      .withColumn("build_share",
        col("n_build") / greatest(sum(col("n_build")).over(w), lit(1L)))
      .withColumn("live_share",
        col("n_live") / greatest(sum(col("n_live")).over(w), lit(1L)))
      // growth denominator floored at the share ONE build row would have
      // had, not at 1e-12: the fixed-1024-partition key-space censuses
      // (band / emb-band tiers) have empty-at-build partitions whenever
      // the corpus holds < ~7k distinct routing keys, and with a raw-zero
      // denominator a SINGLE benign novel document landing in one read
      // growth ~1e12 and flagged the whole index STALE on every ingest
      // (round-12 ADVICE). Under the floor a first arrival reads
      // live_share·nBuild ≈ nBuild/nLive ≈ 1 (benign), while a drifted
      // stream CONCENTRATING into an empty partition still reads
      // share·nBuild ≫ the ≥4× threshold.
      .withColumn("growth",
        col("live_share") / greatest(col("build_share"),
          lit(1.0) / greatest(sum(col("n_build")).over(w).cast("double"), lit(1.0))))
      .orderBy(col(partCol))
  }

  /** (tvd, maxGrowth, nBuild, nLive) over a [[report]] frame —
    * driver-side on census-bounded rows. tvd = ½·Σ|live − build| share
    * (the tightest bound on how far ANY per-partition cost model is
    * off); maxGrowth = the hottest partition's share inflation (the
    * skew form — one region absorbing a hot stream while TVD stays
    * low). */
  def stats(rep: DataFrame): (Double, Double, Long, Long) = {
    val r = rep
      .agg((sum(abs(col("live_share") - col("build_share"))) / 2.0).as("tvd"),
        max(col("growth")).as("mg"),
        sum(col("n_build")).as("nb"), sum(col("n_live")).as("nl"))
      .head()
    (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3))
  }
}
