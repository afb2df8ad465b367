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
}
