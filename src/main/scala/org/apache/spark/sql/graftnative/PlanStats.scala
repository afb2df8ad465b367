package org.apache.spark.sql.graftnative

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Statistics hygiene for checkpoint-CHAINED iterative plans.
  *
  * `Dataset.localCheckpoint` copies the origin plan's estimated
  * statistics into the new `LogicalRDD` leaf (so one checkpoint keeps
  * sane sizes for join planning). For an ITERATIVE operator that
  * checkpoints every round over self-joins of the previous round's
  * checkpoint, that propagation compounds: round r's estimate is a
  * PRODUCT over round r−1's (`SizeInBytesOnlyStatsPlanVisitor.default`
  * multiplies children), so with a 3-way self-join per round the
  * sizeInBytes DIGIT COUNT triples per round. By round ~14 the driver
  * main thread was measured spending minutes per round inside
  * `BigInteger.multiplyToomCook3` on ~10⁸-digit estimates — the whole
  * q45c ×16 "hang" during the round-7 scaling runs. The numbers carry
  * no information at that point (round 0's base is itself the
  * unmaterialized-cache default of 2⁶³).
  *
  * [[withoutPropagatedStats]] rebuilds the checkpointed frame over the
  * SAME RDD with no origin statistics (falling back to
  * `spark.sql.defaultSizeInBytes`, a constant), so each round's
  * estimates are computed from a flat base and stay word-sized.
  * [[withKnownRowCount]] does the same reset but with an honest
  * caller-supplied cardinality instead of the MaxValue fallback —
  * the form the CC loop uses (see its doc below for why). Single
  * checkpoints keep Spark's default propagation, which is the right
  * behavior there. */
object PlanStats {
  def withoutPropagatedStats(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, l.copy()(spark, None, None))
      case _ => ds
    }
  }

  /** Statless is not free: `LogicalRDD` with no origin statistics falls
    * back to `spark.sql.defaultSizeInBytes` (Long.MaxValue), so a
    * genuinely TINY checkpointed table (a CC label table is one row per
    * vertex) reads as un-broadcastable and every join against it plans
    * as a two-sided shuffle. [[withKnownRowCount]] is the honest middle:
    * the caller knows the exact row count (for CC, every round's groupBy
    * output is exactly the vertex set), so the leaf gets
    * `rowCount × flat-row-width` — word-sized (no compounding, the
    * explosion [[withoutPropagatedStats]] exists to stop) yet truthful
    * enough that a 3 MB label table broadcasts and a 3 TB one doesn't. */
  def withKnownRowCount(ds: DataFrame, rowCount: Long): DataFrame = {
    val spark = ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val rowWidth = 8L + ds.schema.fields.map(_.dataType.defaultSize.toLong).sum
        val stats = Statistics(
          sizeInBytes = BigInt(rowCount) * rowWidth,
          rowCount = Some(BigInt(rowCount)))
        org.apache.spark.sql.classic.Dataset.ofRows(spark, l.copy()(spark, Some(stats), None))
      case _ => ds
    }
  }
}
