package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed order statistics over a TOTAL order — global rank and
  * global prefix sum without a single-partition sort (the round-12
  * verdict's q170 construction, shared so every "order the whole table"
  * operator uses one audited implementation):
  *
  *   1. range-partition on the order columns — every row of shard i
  *      precedes every row of shard i+1, so the global statistic
  *      decomposes as (earlier shards' contribution) + (local value);
  *   2. the local value comes from a PARTITIONED window (each shard
  *      sorts only its own slice, in parallel);
  *   3. per-shard totals prefix-sum into offsets (a frame of ≤
  *      shuffle-partition-count rows — the bounded-input exemption the
  *      registry-wide global-window gate allows) and broadcast back.
  *
  * Output is boundary-INVARIANT: callers must pass a TOTAL order (break
  * ties with a unique id column), and then any range-consistent shard
  * assignment yields the same rank/prefix — the sampled
  * RangePartitioner's run-to-run boundary drift cannot move a result.
  * The lazy localCheckpoint pins ONE shard assignment per execution so
  * the local pass and the offset pass can never read two
  * independently-sampled shufflings of the same input (exchange reuse
  * makes them agree in practice; the pin makes it structural). */
private[graft] object Ranks {

  private def sharded(df: DataFrame, order: Seq[Column]): DataFrame = {
    val shards =
      math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 2)
    df.repartitionByRange(shards, order: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint(false)
  }

  private def withOffsets(parted: DataFrame, local: DataFrame,
      total: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shard-count-bounded: ≤ `shards` rows reach the prefix-sum window
    val offsets = parted.groupBy(col("__shard")).agg(total.as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(
        Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), "__shard")
  }

  /** Adds `out` = the row's 0-based global rank in the `order` total
    * order. */
  def globalRank(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parted = sharded(df, order)
    val local = parted.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__shard"))
        .orderBy(order: _*)).cast("long"))
    withOffsets(parted, local, count(lit(1)).cast("long"))
      .withColumn(out, col("__off") + col("__lrn") - 1)
      .drop("__shard", "__lrn", "__off")
  }

  /** Adds `out` = Σ `value` over the rows STRICTLY BEFORE this row in
    * the `order` total order (the exclusive prefix sum range binning
    * and quota-fill rules are built from). `value` must be integral. */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parted = sharded(df, order)
    val local = parted.withColumn("__lsum",
      coalesce(sum(value).over(Window.partitionBy(col("__shard"))
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    withOffsets(parted, local, coalesce(sum(value), lit(0L)))
      .withColumn(out, col("__off") + col("__lsum"))
      .drop("__shard", "__lsum", "__off")
  }
}
