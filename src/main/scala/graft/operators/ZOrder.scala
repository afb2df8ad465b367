package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * layout tool behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
  * the bits of two scan dimensions and range-partitioning + sorting on
  * the interleaved key gives every output file a NARROW min/max envelope
  * on BOTH dimensions, so a predicate on either column prunes ~√F of F
  * files from row-group/file statistics alone. A single-column sort
  * gives perfect pruning on that column and NONE on the other — the
  * reference's analog is its one-dimensional rowkey-prefix sharding
  * (`Cluster.java:66-75`), which this generalizes.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of `x` (even bit positions)
    * and `y` (odd): z = Σᵢ ((x≫i)&1)≪2i | ((y≫i)&1)≪(2i+1). Inputs are
    * masked to `bits` bits, so out-of-range values wrap rather than
    * corrupt high bits. A static fold of 2·bits codegen-friendly terms —
    * no UDF; stays inside whole-stage codegen. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB mirror of [[zValue]] — unrolled bitwise arithmetic so the
    * oracle runs the identical integer computation. Every term is fully
    * parenthesized: DuckDB gives `<<` and `|` equal precedence
    * (left-assoc), so `a << i | b << j` would parse as
    * `((a << i) | b) << j` and overflow. */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((($x & $mask) >> $i) & 1) << ${2 * i})",
        s"(((($y & $mask) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Range-partition into `numFiles` z-contiguous slices and sort within
    * each — the write-side layout step. Each partition becomes one file
    * whose z-range is an interval, i.e. a spatial tile with tight min/max
    * stats on both source columns. The `_zkey` column is retained so the
    * caller can drop it after write or keep it as an explicit sort key. */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame =
    df.withColumn("_zkey", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))

  /** Two-dimensional data-skipping audit for a candidate layout: build
    * the per-shard (min,max) envelope on BOTH scan dimensions from ONE
    * pass (the file-statistics stand-in), then score rectangle
    * predicates against the catalog-scale manifest — the measurement
    * that justifies a re-layout ("under z-order these probes skip 90%
    * of files; under arrival order, nothing"). A shard is pruned when
    * its envelope misses the rectangle on EITHER axis. Run once per
    * layout (shard = arrival bucket, z-bucket, …) and union the tagged
    * reports. Output per predicate:
    * (layout, xlo, xhi, ylo, yhi, n_shards, n_pruned,
    * rows_scanned_bound). */
  def skippingAudit2D(df: DataFrame, shard: Column, layout: String,
      xCol: String, yCol: String,
      preds: Seq[(Long, Long, Long, Long)]): DataFrame = {
    require(preds.nonEmpty, "need at least one rectangle predicate")
    val manifest = df.select(shard.as("shard"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("shard"))
      .agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
        min(col("y")).as("ymn"), max(col("y")).as("ymx"),
        count(lit(1)).as("n_rows"))
    val probes = preds.map { case (xlo, xhi, ylo, yhi) =>
      struct(lit(xlo).as("xlo"), lit(xhi).as("xhi"),
        lit(ylo).as("ylo"), lit(yhi).as("yhi"))
    }
    val p = df.sparkSession.range(1)
      .select(explode(array(probes: _*)).as("p"))
      .select(col("p.xlo").as("xlo"), col("p.xhi").as("xhi"),
        col("p.ylo").as("ylo"), col("p.yhi").as("yhi"))
    p.crossJoin(broadcast(manifest))
      .withColumn("pruned",
        col("xmx") < col("xlo") || col("xmn") > col("xhi") ||
          col("ymx") < col("ylo") || col("ymn") > col("yhi"))
      .groupBy(col("xlo"), col("xhi"), col("ylo"), col("yhi"))
      .agg(count(lit(1)).as("n_shards"),
        count(when(col("pruned"), 1)).as("n_pruned"),
        sum(when(!col("pruned"), col("n_rows")).otherwise(lit(0L)))
          .as("rows_scanned_bound"))
      .select(lit(layout).as("layout"), col("xlo"), col("xhi"), col("ylo"),
        col("yhi"), col("n_shards"), col("n_pruned"), col("rows_scanned_bound"))
  }
}
