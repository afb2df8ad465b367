package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal operator Spark lacks
  * natively, built WITHOUT a range join: a range/θ-join on
  * `r.ts <= l.ts` explodes to O(|L|·|R|) candidates per key and plans as
  * a nested-loop; the scalable formulation is the sort-merge shape —
  * tag both sides, UNION, one window pass per key carrying the latest
  * right payload forward (`last(..., ignoreNulls)` over an unbounded
  * preceding frame), keep the left rows. ONE shuffle on the key, linear
  * work, and the window frame is running state — nothing quadratic at
  * any key skew.
  *
  * Tie discipline (deterministic, DuckDB-ASOF-compatible): at equal
  * timestamps right rows sort BEFORE left rows (inclusive `<=` match),
  * and among right rows the highest `tieCol` wins (the oracle mirrors
  * this by deduplicating the right side per (key, ts) with `max_by`).
  */
object AsOfJoin {

  /** Attach to each left row the single most recent right row with
    * `right(tsCol) <= left(tsCol)` on the same `keyCol`. Right payload
    * columns arrive null when no prior right row exists (left join).
    *
    * @param rightCols right payload columns to attach (renamed as-is)
    * @param tieCol    right-side tie-breaker for equal timestamps
    *                  (highest wins)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String], tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val l = left.select(
      col(keyCol).as("_k") +: col(tsCol).as("_ts") +: lit(1).as("_is_left") +:
        lit(null).cast("long").as("_tie") +:
        lit(null).cast(right.select(payload).schema.head.dataType).as("_r") +:
        leftCols.map(col): _*)
    val r = right.select(
      col(keyCol).as("_k") +: col(tsCol).as("_ts") +: lit(0).as("_is_left") +:
        col(tieCol).cast("long").as("_tie") +: payload.as("_r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // rights before lefts at equal ts (inclusive match); rights at equal
    // ts ordered by tieCol so the running `last` keeps the highest
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_is_left"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** As-of join with a staleness bound (pandas `merge_asof(tolerance=)`):
    * the most recent prior right row counts only if it is at most
    * `toleranceUs` old; staler matches null out, keeping left-join
    * semantics. `tsCol` must be numeric (epoch micros) on both sides so
    * the age is a plain subtraction inside the window pass — the
    * tolerance adds ZERO extra shuffles or joins over [[asOf]]: the
    * matched timestamp rides the running window state alongside the
    * payload, and one residual `when` applies the bound. */
  def asOfWithin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String], tieCol: String,
      toleranceUs: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val l = left.select(
      col(keyCol).as("_k") +: col(tsCol).cast("long").as("_ts") +:
        lit(1).as("_is_left") +: lit(null).cast("long").as("_tie") +:
        lit(null).cast(right.select(payload).schema.head.dataType).as("_r") +:
        leftCols.map(col): _*)
    val r = right.select(
      col(keyCol).as("_k") +: col(tsCol).cast("long").as("_ts") +:
        lit(0).as("_is_left") +: col(tieCol).cast("long").as("_tie") +: payload.as("_r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_is_left"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fresh = col("_ts") - col("_mts") <= toleranceUs
    l.unionAll(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .withColumn("_mts",
        last(when(col("_is_left") === 0, col("_ts")), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => when(fresh, col(s"_match.$c")).as(c)): _*)
  }
}
