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

  /** Key-skew diagnostic: the frequency-of-frequencies histogram of a
    * join/grouping key — for each observed per-key row count, how many
    * keys carry it and how many rows that tier holds in total. THE
    * pre-flight read before choosing a strategy for a 100 TB join: a
    * long flat tail means hash-partitioning is fine; a single key at
    * frequency 10⁷ is the straggler you salt (or AQE-split) for.
    * Shape: one groupBy on the key (map-side partial), one tiny groupBy
    * on the count — two linear passes, output rows = distinct
    * frequencies (bounded, small). */
  def keySkewReport(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("n_keys"))
      .withColumn("rows_at_freq", col("freq") * col("n_keys"))
}
