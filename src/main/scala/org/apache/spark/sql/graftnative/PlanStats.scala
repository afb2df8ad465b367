package org.apache.spark.sql.graftnative

import org.apache.spark.sql.DataFrame
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
  * estimates are computed from a flat base and stay word-sized. Loops
  * that chain checkpoints (connected components, streaming CC folds)
  * wrap every per-round checkpoint with it; single checkpoints keep
  * Spark's default propagation, which is the right behavior there. */
object PlanStats {
  def withoutPropagatedStats(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, l.copy()(spark, None, None))
      case _ => ds
    }
  }
}
