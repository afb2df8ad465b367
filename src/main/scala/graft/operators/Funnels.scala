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

  private val DayUs = 86400000000L

  /** Cohort retention: cohort each entity by its FIRST active day, then
    * count, per (cohort day, day offset), the entities active again
    * `offset` days later — the triangle every growth dashboard plots.
    *
    * Shape: distinct (entity, day) first (collapses each entity's event
    * volume to its active-day set — the skew bound), one aggregate for
    * the cohort day, one equi-join on the entity key, one final count.
    * Both shuffles key on the entity id (high-cardinality); nothing is
    * windowed over the raw log and nothing broadcasts an unbounded side. */
  def retention(events: DataFrame, keyCol: String, tsUsCol: String,
      maxOffsetDays: Int): DataFrame = {
    val days = events
      .select(col(keyCol), expr(s"CAST($tsUsCol AS BIGINT) div $DayUs").as("day"))
      .distinct()
    val cohorts = days.groupBy(col(keyCol)).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq(keyCol))
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Next-event-prediction training examples (the sequence-model
    * example builder): per user, ordered by (ts, id), each event with a
    * full 3-deep history becomes one example — history = the previous
    * three event types oldest-first, label = the current type. A fixed
    * lag chain (not collect_list) keeps the row bounded and the whole
    * thing one per-user window pass: the single shuffle keys on the
    * high-cardinality user id, so it scales exactly like the
    * sessionize/retention family. */
  def nextEventExamples(events: DataFrame, keyCol: String, tsUsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    events
      .withColumn("h1", lag(col(typeCol), 1).over(w))
      .withColumn("h2", lag(col(typeCol), 2).over(w))
      .withColumn("h3", lag(col(typeCol), 3).over(w))
      .filter(col("h3").isNotNull)
      .select(col(keyCol), col(idCol),
        concat_ws(">", col("h3"), col("h2"), col("h1")).as("history"),
        col(typeCol).as("label"))
  }
}
