package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators for a continuously-ingested corpus: CDC
  * upsert (apply a change batch to a keyed snapshot) and incremental
  * aggregate maintenance (fold a delta's partial aggregates into a
  * standing aggregate without rescanning the base).
  *
  * The reference's closest analog is the grow-only `preprocess` table
  * reloaded per ingest run (`kmeans.java:130-158`) — it has no update or
  * delete story at all; these operators supply the missing lifecycle for
  * a 100 TB corpus where full rebuilds are not an option.
  *
  * Scale shape: everything here is a plain shuffle on the snapshot key
  * (or the aggregate's group key). No broadcasts of unbounded sides, no
  * windows over anything wider than one key's change history, no
  * driver-side state.
  */
object Maintenance {

  /** Apply a CDC change batch to a keyed snapshot, last-write-wins.
    *
    * `changes` carries the full base payload plus `opCol` (one of
    * 'I'/'U'/'D') and `seqCol` (change sequence number — higher wins;
    * ties break on the op string descending, so 'U' outranks 'I' and
    * 'D' outranks both, making replays deterministic even on malformed
    * feeds that reuse a sequence number).
    *
    * Result = base rows whose key is untouched, plus the latest
    * surviving change row per touched key (deletes drop the key).
    * Exactly two shuffles on the key (the per-key window and the
    * anti-join), each linear; a key's cost is bounded by ITS change
    * count, so the operator survives any corpus size and any number of
    * appends — the production MERGE INTO shape. */
  def cdcUpsert(base: DataFrame, changes: DataFrame,
      keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(desc(seqCol), desc(opCol))
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val untouched = base.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D").select(payload.map(col): _*)
    untouched.select(payload.map(col): _*).unionByName(upserts)
  }

  /** Build a type-2 slowly-changing-dimension history from a version
    * feed: each key's versions ordered by (`tsCol`, `seqCol`) become
    * rows with `valid_from_us` = the version's timestamp,
    * `valid_to_us` = the NEXT version's timestamp (null while current)
    * and an `is_current` flag — the standard warehouse dimension-history
    * shape. One window pass per key; a key's cost is its own version
    * count, so the build parallelizes over keys at any history size. */
  def scd2(versions: DataFrame, keyCol: String, tsUsCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(seqCol))
    versions
      .withColumn("valid_from_us", col(tsUsCol))
      .withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Fold partial-aggregate tables (a standing snapshot aggregate plus
    * one or more delta aggregates, unioned by the caller) into one
    * merged aggregate: sums/counts re-sum, mins take min, maxs take max.
    * Every column in `partials` must be a group key or one of the
    * declared mergeable columns — averages and other ratios are NOT
    * mergeable and must be derived AFTER the merge (sum/count), which is
    * why this API does not accept them.
    *
    * This is incremental materialized-view maintenance: the base table
    * is never rescanned; the delta contributes |delta| rows of partials
    * and one shuffle on the group key merges them. */
  def mergePartials(partials: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    partials.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental materialized-aggregate maintenance: fold a CDC batch of
    * (key, op, value) rows into the current per-key (n, total) STATE
    * without rescanning the base — the batch collapses to per-key deltas
    * (map-side partial), merges with one full-outer join, and keys whose
    * count reaches zero drop out. Cost scales with the BATCH, never the
    * base: the only way a 100 TB rollup stays fresh. `total` rides
    * whatever exact type the state carries (DECIMAL for money);
    * deletions must mirror prior inserts (CDC contract) or n goes
    * negative — the filter treats that as fully-deleted rather than
    * publish a corrupt row. */
  def incrementalAggMaintain(state: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String, valueCol: String): DataFrame = {
    val sign = when(col(opCol) === "insert", lit(1)).otherwise(lit(-1))
    val delta = changes.groupBy(col(keyCol)).agg(
      sum(sign.cast("long")).as("__dn"),
      sum(col(valueCol) * sign).as("__dt"))
    state.join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast(delta.schema("__dt").dataType))
          + coalesce(col("__dt"), lit(0))).as("total"))
      .filter(col("n") > 0)
  }

  /** Merkle-style range checksums for table synchronization: rows hash
    * into their key range's order-independent checksum (sum of
    * polynomial row hashes mod P — commutative, so no sort, and exact
    * int64: each hash < P ≈ 2³⁰, safe to ~2³³ rows per range). Two
    * snapshots' checksum frames anti-agree exactly on the ranges that
    * differ — ship only those, the way state-sync and backfill-repair
    * pipelines bound their transfer to the damage, not the table. */
  def rangeChecksums(df: DataFrame, keyCol: String, rangeWidth: Long,
      cols: Seq[String]): DataFrame = {
    df.select(expr(s"$keyCol div $rangeWidth").as("bucket"),
        graft.functions.TextHash.polyHash(
          concat_ws("|", cols.map(c => col(c).cast("string")): _*)).as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h")) % graft.functions.TextHash.P).as("checksum"))
  }

  /** Point-in-time (AS OF) join against an [[scd2]] dimension: each fact
    * row picks the dimension version whose validity interval contains
    * its timestamp (`valid_from ≤ ts < valid_to`, open current version).
    * The dimension KEY is an equi-join key — this is a plain keyed
    * shuffle join with the interval test as a residual, NOT the
    * no-equi-key range join ([[RangeJoin]] handles that case) — so it
    * partitions on the key at any scale; a fact matches at most one
    * version (SCD2 intervals are disjoint per key; zero-width intervals
    * from same-timestamp versions match nothing, on both engines). */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      tsUsCol: String): DataFrame =
    facts.join(dim, Seq(keyCol))
      .filter(col("valid_from_us") <= col(tsUsCol) &&
        (col("valid_to_us").isNull || col(tsUsCol) < col("valid_to_us")))

  /** Snapshot reconciliation: classify every key of two table versions
    * as added / removed / changed / unchanged by comparing a content
    * hash of the compared columns — the CDC-validation diff a pipeline
    * runs after a backfill or an engine migration. One full-outer
    * equi-join on the key; hashes computed map-side, so the shuffle
    * carries (key, hash), never the row bodies. Callers pre-cast
    * floating columns to DECIMAL strings if the diff must be
    * render-stable across engines. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, h: String) = df.select(
      keys.map(col) :+ md5(concat_ws("|",
        compareCols.map(c => col(c).cast("string")): _*)).as(h): _*)
    hashed(oldDf, "__h_old")
      .join(hashed(newDf, "__h_new"), keys, "full_outer")
      .withColumn("diff_class",
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged"))
      .select(keys.map(col) :+ col("diff_class"): _*)
  }

  /** Small-files compaction plan: group input files into target-sized
    * compaction bins by prefix-sum range binning — files sort by
    * (bytes DESC, id) and a file's bin is its PRECEDING cumulative
    * bytes div `targetBytes`, so each bin covers one contiguous
    * target-sized span of the size-sorted stream. Deterministic and a
    * pure window rule (first/next-fit-decreasing needs a mutable bin
    * list no set-based engine replays identically), with the bounds
    * that matter for compaction: every bin except the last holds ≥
    * target bytes before its boundary file, and overfill per bin is at
    * most one file. The input is the FILE MANIFEST (catalog-scale) —
    * but even a 100 M-file manifest never passes through a
    * single-partition sort: the exclusive prefix sum is
    * [[Ranks.globalPrefixSum]] (range shards + per-shard cumulative
    * sums + broadcast offsets), so the registry-wide global-window gate
    * holds with no allowlist entry. Output one row per bin:
    * (bin, n_files, total_bytes, min_file_id, max_file_id). */
  def compactionPlan(files: DataFrame, idCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0: $targetBytes")
    Ranks.globalPrefixSum(
        files.select(col(idCol).as("fid"), col(bytesCol).cast("long").as("bytes")),
        Seq(col("bytes").desc, col("fid")), col("bytes"), "before")
      .withColumn("bin", expr(s"before div ${targetBytes}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"),
        min(col("fid")).as("min_file_id"), max(col("fid")).as("max_file_id"))
  }

  /** Zone-map pruning audit: build the per-shard (min, max, rows)
    * manifest a lakehouse keeps per file, then score a predicate set
    * against it — "if queries filter on this column, what fraction of
    * shards does the layout actually let us skip?" The data is scanned
    * ONCE for the manifest (shard = keyCol div shardWidth, the
    * file-assignment stand-in); each [lo, hi] probe then runs against
    * the catalog-scale manifest (broadcast, no second data pass). A
    * shard is pruned when its range misses the predicate entirely
    * (mx < lo or mn > hi). Output per predicate:
    * (lo, hi, n_shards, n_pruned, rows_scanned_bound). */
  def zoneMapAudit(df: DataFrame, keyCol: String, valueCol: String,
      shardWidth: Long, preds: Seq[(Long, Long)]): DataFrame = {
    require(shardWidth > 0 && preds.nonEmpty, "need shardWidth > 0 and predicates")
    val manifest = df.select(
        expr(s"$keyCol div ${shardWidth}L").as("shard"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("shard"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("rows"))
    val probes = preds.map { case (lo, hi) =>
      struct(lit(lo).as("lo"), lit(hi).as("hi"))
    }
    val p = manifest.sparkSession.range(1).select(
        explode(array(probes: _*)).as("p"))
      .select(col("p.lo").as("lo"), col("p.hi").as("hi"))
    p.crossJoin(broadcast(manifest))
      .withColumn("pruned", col("mx") < col("lo") || col("mn") > col("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_shards"),
        count(when(col("pruned"), 1)).as("n_pruned"),
        sum(when(!col("pruned"), col("rows")).otherwise(lit(0L)))
          .as("rows_scanned_bound"))
  }

  /** Collect table AND column statistics so Catalyst's cost-based
    * optimizer can pick join orders from DATA rather than SQL syntax —
    * the statistics half of table maintenance (the ANALYZE a warehouse
    * runs after large loads/compactions). With
    * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled` set,
    * a star join written fact-first reorders to join the filtered
    * dimension first and the fact table LAST (CboSpec pins the plan and
    * the unchanged result). Column stats are what make filter
    * selectivity estimable — size-only stats can't see that
    * `c_mktsegment = '…'` keeps a fifth of the rows. At 100 TB the
    * reorder is the difference between shuffling the fact table against
    * an unfiltered dimension and against a fifth of it. */
  def analyzeForCbo(spark: org.apache.spark.sql.SparkSession,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  /** ANALYZE with EQUI-HEIGHT HISTOGRAMS on the named columns.
    * min/max/ndv column stats assume a uniform distribution: a range
    * predicate over a right-skewed column (events.value — median 35,
    * max 490) estimates `value > 220` at ~55% by min-max interpolation
    * when the truth is ~1%, and CBO sizes the whole downstream join
    * graph off that 50× error. The histogram's per-bin bounds make the
    * estimate bin-accurate (CboSpec measures both states on the real
    * table). `spark.sql.statistics.histogram.enabled` is read at
    * ANALYZE time — it controls whether the histogram is BUILT (one
    * extra aggregation pass per column); plan-time use needs only
    * cbo.enabled, which GraftRuntime sets. */
  def analyzeWithHistograms(spark: org.apache.spark.sql.SparkSession,
      table: String, columns: Seq[String]): Unit = {
    val key = "spark.sql.statistics.histogram.enabled"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
