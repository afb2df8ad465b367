package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime and is the first line of defense. Salting is the
  * explicit fallback when one side must be replicated anyway (e.g. a
  * medium dimension too big to broadcast joined on a power-law key): the
  * skewed (large) side gets a random salt in [0, factor), the build side
  * is replicated `factor` times, and the join key becomes (key, salt) —
  * one hot key spreads across `factor` tasks instead of one straggler.
  *
  * `rand(seed)` keeps runs replayable. Result equals the plain inner
  * equi-join row-for-row (verified by SkewJoinSpec).
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int, seed: Long = 42L): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn("__salt", (rand(seed) * factor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key)).drop("__salt")
  }
}
