package org.apache.spark.sql.graftnative

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters summary as a custom Catalyst AGGREGATE
  * (`TypedImperativeAggregate`) — the engine's (b)-tier ladder extended
  * from scalar expressions to aggregation state: partial buffers build
  * per-partition (map-side), `merge` combines them pairwise, and the
  * whole thing is bounded at `k-1` counters per buffer however large the
  * input — the sketch shape that replaces a full groupBy when only the
  * frequent items matter at 100 TB.
  *
  * Guarantee (mergeable-summaries bound): after any sequence of updates
  * and merges, every item with true frequency > n/k is present in the
  * buffer, and each counter undercounts by at most n/k. The OUTPUT is
  * therefore a candidate SUPERSET of the true heavy hitters, not an
  * approximation of their counts — callers re-count candidates exactly
  * (one cheap semi-joined aggregation) and filter `cnt·k > n`, making
  * the final result EXACT and oracle-checkable while the sketch bounds
  * the memory (`graft.operators.TextAnalysis.heavyHitters`).
  *
  * Buffer ops: weighted add inserts/increments; on overflow past k-1
  * counters the minimum count is subtracted from every counter and
  * zeros evicted (the weighted Misra–Gries step). Eval emits the
  * candidate items sorted ascending (deterministic output order).
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, "misra-gries needs k >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  private def add(buf: java.util.HashMap[Long, Long], item: Long, w: Long): Unit = {
    val cur = buf.get(item) // 0L when absent (unboxed default)
    buf.put(item, cur + w)
    if (buf.size > k - 1) {
      // weighted MG step: shed the minimum from every counter; at least
      // the argmin hits zero, restoring size <= k-1
      var mn = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < mn) mn = v }
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - mn
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Long], other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(buf, e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val keys = new Array[Long](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[Long, Long](n * 2)
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

/** Bounded top-k as a custom Catalyst aggregate: per-group the k
  * largest (value, id) pairs by (value DESC, id ASC), with aggregation
  * state bounded at k entries per buffer — the scale-right physical
  * shape for "top k per group". The window form
  * (`row_number over (partition by g order by v desc)`) must shuffle
  * and SORT every row of every group; this aggregate keeps a k-entry
  * ordered buffer per group per partition (map-side partials), merges
  * buffers pairwise, and ships at most k entries per group across the
  * wire — the difference between O(n log n) per group and O(n log k)
  * with k-bounded shuffle volume at 100 TB. Output: the k pairs as an
  * array<struct<v,id>> in rank order (deterministic: full tie-break on
  * id). EXACT, not a sketch — (value, id) is a total order, so partial
  * top-k sets merge losslessly. */
case class TopKAgg(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[(Long, Long), Unit]]
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1, "topK needs k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): java.util.TreeMap[(Long, Long), Unit] =
    new java.util.TreeMap[(Long, Long), Unit](TopKAgg.Ord)

  private def add(buf: java.util.TreeMap[(Long, Long), Unit], v: Long, id: Long): Unit = {
    buf.put((v, id), ())
    if (buf.size > k) buf.pollLastEntry()
  }

  override def update(buf: java.util.TreeMap[(Long, Long), Unit],
      input: InternalRow): java.util.TreeMap[(Long, Long), Unit] = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null) add(buf, v.asInstanceOf[Long], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeMap[(Long, Long), Unit],
      other: java.util.TreeMap[(Long, Long), Unit]): java.util.TreeMap[(Long, Long), Unit] = {
    val it = other.keySet().iterator()
    while (it.hasNext) { val p = it.next(); add(buf, p._1, p._2) }
    buf
  }

  override def eval(buf: java.util.TreeMap[(Long, Long), Unit]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p._1, p._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[(Long, Long), Unit]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.keySet().iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1).putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[(Long, Long), Unit] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put((bb.getLong, bb.getLong), ()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKAgg = copy(left = l, right = r)
}

object TopKAgg {
  /** (v desc, id asc): the head of the map is the BEST pair, the tail
    * the eviction candidate. Serializable — the expression ships to
    * executors inside the physical plan. */
  object Ord extends java.util.Comparator[(Long, Long)] with Serializable {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}

/** KLL quantile sketch ([[graft.operators.KllSketch]]) as a custom
  * Catalyst aggregate — the piece the RDD `treeReduce` form
  * (`Quantiles.sketchColumn`) cannot give: PER-GROUP sketch quantiles in
  * one shuffle of O(k·log(n/k))-byte partial buffers. The exact grouped
  * form (`q145_grouped_quantiles`, window sort per group) shuffles and
  * sorts EVERY ROW of every group; this aggregate builds map-side
  * sketches per (partition, group), merges them pairwise, and ships only
  * sketch state — the right physical shape when groups are billions of
  * rows and callers need p50/p95/p99 per key at 100 TB.
  *
  * Output: array of quantile estimates, one per requested p (null iff
  * the group had no non-null input). DETERMINISM CONTRACT: estimates
  * depend on the merge tree, which Spark does not fix across runs — the
  * uniform rank-error bound holds for EVERY merge order (what
  * QuantileSketchSpec pins per group against exact ranks), but the
  * estimate itself is not bit-stable, so registry row q207 gets the
  * rows-only gate (same contract as q29's engine-private HLL++, and the
  * documented reason `Quantiles.sketchColumn` stays the bit-replayable
  * path for the global case). */
case class KllQuantileAgg(child: Expression, k: Int, ps: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[graft.operators.KllSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
    s"quantile ps must be non-empty and within [0,1], got $ps")
  // validate k HERE, not in KllSketch's constructor: the sketch is first
  // built executor-side (createAggregationBuffer), so a bad k — including
  // user-supplied text via the graft_kll_quantiles SQL path — would
  // otherwise surface as a task failure that never names the aggregate
  require(k >= 8, s"graft_kll_quantiles needs k >= 8 (accuracy parameter), got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def createAggregationBuffer(): graft.operators.KllSketch =
    graft.operators.KllSketch.empty(k)

  override def update(buf: graft.operators.KllSketch,
      input: InternalRow): graft.operators.KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: graft.operators.KllSketch,
      other: graft.operators.KllSketch): graft.operators.KllSketch =
    buf.merge(other)

  override def eval(buf: graft.operators.KllSketch): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(ps.map(buf.quantile).toArray)

  override def serialize(buf: graft.operators.KllSketch): Array[Byte] =
    buf.toBytes
  override def deserialize(bytes: Array[Byte]): graft.operators.KllSketch =
    graft.operators.KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KllQuantileAgg =
    copy(child = c)
}

object SketchAggregates {
  /** Misra–Gries candidate heavy hitters of a LongType column: an
    * array of ≤ k-1 items guaranteed to contain every item with
    * frequency > n/k. */
  def misraGries(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Exact bounded top-k of (value, id) pairs by (value DESC, id ASC):
    * array<struct<v,id>> in rank order, k-bounded aggregation state. */
  def topK(value: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(value), ExpressionUtils.expression(id), k)
        .toAggregateExpression())

  /** KLL sketch quantile estimates of a DoubleType column: array of one
    * estimate per requested p, O(k·log(n/k)) aggregation state per
    * group — the grouped-quantile shape for 100 TB. */
  def kllQuantiles(c: Column, ps: Seq[Double], k: Int = 200): Column =
    ExpressionUtils.column(
      KllQuantileAgg(ExpressionUtils.expression(c), k, ps).toAggregateExpression())

  private def litNum(e: Expression, fn: String): Double = {
    require(e.foldable && e.eval() != null,
      s"$fn: sketch parameters must be non-null literals")
    e.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL `0.5` parses as Decimal
      case n: Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"$fn: sketch parameters must be numeric literals, got $other")
    }
  }

  /** SQL-name registration (`graft_misra_gries(x, k)`,
    * `graft_topk(v, id, k)`, `graft_kll_quantiles(x, k, p...)`) so
    * `spark.sql` text reaches the sketch aggregates too — the analyzer
    * wraps a returned AggregateFunction into its AggregateExpression,
    * so these builders return the bare function. Sketch parameters must
    * be literals (they size aggregation buffers at plan time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_misra_gries"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_misra_gries takes (x, k)")
        MisraGriesAgg(children.head, litNum(children(1), "graft_misra_gries").toInt)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_topk takes (v, id, k)")
        TopKAgg(children.head, children(1), litNum(children(2), "graft_topk").toInt)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantileAgg].getName, "graft_kll_quantiles"),
      (children: Seq[Expression]) => {
        require(children.size >= 3, "graft_kll_quantiles takes (x, k, p, ...)")
        KllQuantileAgg(children.head,
          litNum(children(1), "graft_kll_quantiles").toInt,
          children.drop(2).map(litNum(_, "graft_kll_quantiles")))
      })
  }
}
