package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order interleave correctness vs a bit-by-bit reference, plus the
  * data-skipping claim itself: on a 2-D grid, z-clustered layout gives
  * every output slice a tight min/max envelope on BOTH dimensions, so a
  * predicate on the NON-sort column prunes most slices — a single-column
  * sort prunes nothing on the other dimension. Partitions stand in for
  * files (the write path maps them 1:1). */
class ZOrderSpec extends SparkSpec {

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit reference (seeded random + edges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val vals = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L), (65536L, 2L)) ++
      (1 to 200).map(_ => (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = vals.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    vals.foreach { case (x, y) =>
      assert(got((x, y)) === zRef(x & 0xFFFF, y & 0xFFFF, 16),
        s"mismatch at ($x,$y)")
    }
  }

  test("z-clustered slices prune on the second dimension; x-sorted slices do not") {
    import spark.implicits._
    val grid = for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val slices = 64

    def yEnvelopes(d: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      d.select(col("y")).mapPartitions { it =>
        val ys = it.map(_.getLong(0)).toArray
        if (ys.isEmpty) Iterator.empty else Iterator((ys.min, ys.max))
      }.collect()

    def intersecting(envs: Array[(Long, Long)], lo: Long, hi: Long): Int =
      envs.count { case (mn, mx) => mn <= hi && mx >= lo }

    val zEnvs = yEnvelopes(ZOrder.cluster(df, col("x"), col("y"), slices, bits = 8))
    val xEnvs = yEnvelopes(
      df.repartitionByRange(slices, col("x")).sortWithinPartitions(col("x")))

    // the y-band [100,107] covers 8/256 of the grid: an x-sorted layout
    // puts every y into every slice (zero skipping); the z-layout confines
    // the band to the row of 32x32 tiles that covers it
    val zHit = intersecting(zEnvs, 100L, 107L)
    val xHit = intersecting(xEnvs, 100L, 107L)
    assert(xHit === xEnvs.length, s"x-sorted layout should not prune, hit $xHit")
    assert(zHit * 4 <= zEnvs.length,
      s"z-order should prune >= 3/4 of slices, hit $zHit of ${zEnvs.length}")
  }
}
