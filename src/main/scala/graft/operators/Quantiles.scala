package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** KLL-style mergeable quantile sketch (Karnin, Lang & Liberty,
  * "Optimal Quantile Approximation in Streams", FOCS 2016 — public
  * literature) alongside the engine's EXACT rank tier
  * (`QualityChecks.centsSql` histograms, q29's fixed-bin quantiles).
  *
  * Where the exact tier needs either a full sort or a value-bounded
  * histogram, the sketch summarizes ANY numeric column in O(k·log(n/k))
  * space with uniform rank error, and two sketches MERGE — the property
  * that makes it the right shape for 100 TB (per-partition sketches
  * tree-reduce; no shuffle of raw values) and for streams (per-batch
  * sketches fold into a running one; see
  * `StreamOps.streamingQuantileFold`).
  *
  * Implementation notes:
  *  - levels of weight 2^i; every level holds ≤ k items (the constant-
  *    capacity variant of KLL — more memory than the 2/3-decay original,
  *    strictly better accuracy, simpler invariants);
  *  - compaction sorts the level and keeps alternate items, flipping the
  *    kept parity per level-compaction so successive compactions cancel
  *    rather than accumulate rank bias (the deterministic-parity variant
  *    of KLL's coin flip: reproducible runs, no engine-private RNG);
  *  - estimates are therefore deterministic for a fixed arrival order;
  *    across different partitionings the ESTIMATES may differ but the
  *    error BOUND holds for every order, which is what the specs pin
  *    (the same contract as the countMin/HLL sketches already shipped).
  */
final class KllSketch private (val k: Int) extends Serializable {
  require(k >= 8, s"KllSketch needs k >= 8, got $k")

  private var levels: Array[Array[Double]] = Array(Array.empty)
  private var buffer = new scala.collection.mutable.ArrayBuffer[Double](k)
  private var parities: Array[Boolean] = Array(false)
  private var count: Long = 0L

  def n: Long = count
  def numLevels: Int = levels.length

  def update(x: Double): Unit = {
    buffer += x
    count += 1
    if (buffer.size >= k) flushBuffer()
  }

  private def flushBuffer(): Unit = {
    if (buffer.nonEmpty) {
      levels(0) = levels(0) ++ buffer
      buffer.clear()
      compactFrom(0)
    }
  }

  private def ensureLevel(i: Int): Unit =
    if (i >= levels.length) {
      levels = levels ++ Array.fill(i - levels.length + 1)(Array.empty[Double])
      parities = parities ++ Array.fill(i - parities.length + 1)(false)
    }

  private def compactFrom(start: Int): Unit = {
    var i = start
    while (i < levels.length && levels(i).length >= k) {
      val sorted = levels(i).sorted
      val offset = if (parities(i)) 1 else 0
      parities(i) = !parities(i)
      val kept = Array.newBuilder[Double]
      var j = offset
      while (j < sorted.length) { kept += sorted(j); j += 2 }
      ensureLevel(i + 1)
      levels(i + 1) = levels(i + 1) ++ kept.result()
      levels(i) = Array.empty
      i += 1
    }
  }

  /** Merge `o` into a NEW sketch; both inputs are left untouched.
    * Associative up to compaction order; the error bound is preserved
    * because merged levels carry equal weights. */
  def merge(o: KllSketch): KllSketch = {
    require(o.k == k, s"cannot merge sketches with k=$k and k=${o.k}")
    val r = new KllSketch(k)
    val maxL = math.max(levels.length, o.levels.length)
    r.ensureLevel(maxL - 1)
    var i = 0
    while (i < maxL) {
      val a = if (i < levels.length) levels(i) else Array.empty[Double]
      val b = if (i < o.levels.length) o.levels(i) else Array.empty[Double]
      r.levels(i) = a ++ b
      i += 1
    }
    r.buffer ++= buffer
    r.buffer ++= o.buffer
    r.count = count + o.count
    if (r.buffer.size >= k) r.flushBuffer()
    r.compactFrom(0)
    r
  }

  /** Estimated number of items ≤ x. */
  def rank(x: Double): Long = {
    var r = 0L
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      val lv = levels(i)
      var j = 0
      while (j < lv.length) { if (lv(j) <= x) r += w; j += 1 }
      i += 1
    }
    var j = 0
    while (j < buffer.size) { if (buffer(j) <= x) r += 1; j += 1 }
    r
  }

  /** Estimated p-quantile (0 ≤ p ≤ 1): the smallest retained value whose
    * estimated rank reaches p·n. */
  def quantile(p: Double): Double = {
    require(p >= 0 && p <= 1, s"quantile p must be in [0,1], got $p")
    require(count > 0, "quantile of an empty sketch")
    val weighted = {
      val b = Array.newBuilder[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => b += ((v, w)))
        i += 1
      }
      buffer.foreach(v => b += ((v, 1L)))
      b.result().sortBy(_._1)
    }
    val target = math.max(1L, math.ceil(p * count).toLong)
    var cum = 0L
    var i = 0
    while (i < weighted.length) {
      cum += weighted(i)._2
      if (cum >= target) return weighted(i)._1
      i += 1
    }
    weighted.last._1
  }

  /** Retained items across all levels (diagnostics / space assertions). */
  def retained: Int = levels.map(_.length).sum + buffer.size

  /** Compact binary state — the wire format of the native Catalyst
    * aggregate's partial buffers ([[org.apache.spark.sql.graftnative.KllQuantileAgg]]):
    * k, count, the unflushed buffer, then per level (parity, items).
    * Explicit layout, not Java serialization: partial aggregation
    * buffers ship on every map-side combine, so the format is sized
    * exactly (≤ O(k·log(n/k)) doubles) and versioned by construction. */
  def toBytes: Array[Byte] = {
    val nDoubles = buffer.size + levels.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 4 + levels.length * 5 + nDoubles * 8)
    bb.putInt(k).putLong(count)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putDouble)
    bb.putInt(levels.length)
    var i = 0
    while (i < levels.length) {
      bb.put(if (parities(i)) 1.toByte else 0.toByte)
      bb.putInt(levels(i).length)
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object KllSketch {
  def empty(k: Int = 200): KllSketch = new KllSketch(k)

  def fromValues(xs: IterableOnce[Double], k: Int = 200): KllSketch = {
    val s = new KllSketch(k)
    xs.iterator.foreach(s.update)
    s
  }

  /** Inverse of [[KllSketch.toBytes]]. */
  def fromBytes(bytes: Array[Byte]): KllSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new KllSketch(bb.getInt)
    s.count = bb.getLong
    val bufN = bb.getInt
    var i = 0
    while (i < bufN) { s.buffer += bb.getDouble; i += 1 }
    val nLevels = bb.getInt
    s.levels = new Array[Array[Double]](nLevels)
    s.parities = new Array[Boolean](nLevels)
    i = 0
    while (i < nLevels) {
      s.parities(i) = bb.get() == 1.toByte
      val n = bb.getInt
      val lv = new Array[Double](n)
      var j = 0
      while (j < n) { lv(j) = bb.getDouble; j += 1 }
      s.levels(i) = lv
      i += 1
    }
    s
  }
}

/** DataFrame/stream entry points for [[KllSketch]]. */
object Quantiles {

  /** Sketch one numeric column: per-partition sketches, tree-reduced —
    * the raw values NEVER shuffle (each partition ships ≤ O(k·log n)
    * doubles to the driver), which is the whole point at 100 TB vs an
    * exact sort. The RDD hop is the documented per-partition imperative
    * case; everything upstream of it stays a pruned columnar scan. */
  def sketchColumn(df: DataFrame, valueCol: String, k: Int = 200): KllSketch = {
    val values: Dataset[Double] = {
      import df.sparkSession.implicits._
      df.select(col(valueCol).cast("double")).filter(col(valueCol).isNotNull)
        .as[Double]
    }
    values.rdd
      .mapPartitions(it => Iterator(KllSketch.fromValues(it, k)))
      .treeReduce((a, b) => a.merge(b), depth = 2)
  }

  /** Sketch quantiles as a small report frame: one row per requested p,
    * (p, value_est, n, retained). */
  def quantileReport(df: DataFrame, valueCol: String, ps: Seq[Double],
      k: Int = 200): DataFrame = {
    val s = sketchColumn(df, valueCol, k)
    val spark = df.sparkSession
    import spark.implicits._
    ps.map(p => (p, s.quantile(p), s.n, s.retained))
      .toDF("p", "value_est", "n", "retained")
  }

  /** PER-GROUP sketch quantiles via the native Catalyst aggregate
    * ([[org.apache.spark.sql.graftnative.KllQuantileAgg]]): one row per
    * (group, p) with the estimate and the group's exact count. Unlike
    * the exact grouped form (window sort: every row of every group
    * shuffles AND sorts), the only thing that crosses the wire here is
    * O(k·log(n/k)) sketch state per (map partition, group) — the shape
    * that still works when one key holds 10^10 rows. */
  def groupedQuantileReport(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], k: Int = 200): DataFrame = {
    import org.apache.spark.sql.graftnative.SketchAggregates
    val agg = df.groupBy(col(groupCol))
      .agg(
        SketchAggregates.kllQuantiles(col(valueCol).cast("double"), ps, k).as("est"),
        count(col(valueCol)).as("n"))
    val pArr = array(ps.map(lit): _*)
    // posexplode_OUTER: a group whose values are entirely NULL has a null
    // sketch array (count(valueCol) = 0); plain posexplode would emit no
    // rows and the group would silently vanish from the report. The outer
    // form keeps it as one (group, value_est = null, n = 0) row.
    agg.select(col(groupCol), col("n"), posexplode_outer(col("est")))
      .select(col(groupCol), element_at(pArr, col("pos") + 1).as("p"),
        col("col").as("value_est"), col("n"))
  }
}
