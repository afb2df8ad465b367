package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel / conversion analytics over an event stream: for each entity,
  * did step B happen within a window after the FIRST step A — the
  * product-analytics query every event warehouse runs (activation,
  * conversion, retention all reduce to it).
  *
  * Scale shape: one aggregate per side keyed by the entity (map-side
  * partial), one equi-join on the entity key, one final aggregate. No
  * window over the raw event log, no self-join of the full stream —
  * each entity's cost is its own event count, so skewed users bound
  * their own work. */
object Funnels {

  /** Two-step funnel: per `keyCol` entity, the first `stepA` event, the
    * first `stepB` event AT OR AFTER it, and whether that happened
    * within `windowUs`. Entities with no `stepA` event are absent;
    * entities that never convert keep a null `b_us` and
    * `converted = false`. `tsUsCol` is epoch micros. */
  def conversion(events: DataFrame, typeCol: String, keyCol: String,
      tsUsCol: String, stepA: String, stepB: String,
      windowUs: Long): DataFrame = {
    val firstA = events.filter(col(typeCol) === stepA)
      .groupBy(col(keyCol)).agg(min(col(tsUsCol)).as("a_us"))
    val bs = events.filter(col(typeCol) === stepB)
      .select(col(keyCol), col(tsUsCol).as("b_ts"))
    firstA.join(bs, Seq(keyCol), "left")
      .withColumn("b_eligible", when(col("b_ts") >= col("a_us"), col("b_ts")))
      .groupBy(col(keyCol), col("a_us"))
      .agg(min(col("b_eligible")).as("b_us"))
      .withColumn("converted",
        col("b_us").isNotNull && col("b_us") - col("a_us") <= windowUs)
      .select(col(keyCol), col("a_us"), col("b_us"), col("converted"))
  }
}
