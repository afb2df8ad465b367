package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair over an event log: regularize an irregular
  * per-entity series onto a fixed grid and forward-fill the holes —
  * the resample + LOCF (last observation carried forward) pass every
  * metrics store and feature pipeline runs before windowed math.
  */
object TimeSeries {

  /** Hourly grid per entity from its first to its last observation,
    * missing hours carried forward (LOCF). Per (entity, hour) the
    * OBSERVED value is the latest event's (ties broken by `tieCol` —
    * deterministic cross-engine). Shape: one groupBy collapses the log
    * to observed (entity, hour) rows, the grid explodes a per-entity
    * `sequence` (rows = span hours, never a cross join with a global
    * calendar), and the fill is one per-entity window pass ordered by
    * hour. Every shuffle keys on the entity id. A pathological span
    * (one entity alive for years) bounds its own row count, not the
    * job's.
    *
    * `tsUsCol` is epoch micros. Output: (keyCol, hour, value,
    * is_observed) where hour = epoch hours and value is LOCF-filled
    * (null before an entity's first observation never occurs — the grid
    * starts at it). */
  def gapFillHourlyLocf(events: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val hourUs = 3600000000L
    val byHour = events.select(col(keyCol),
      expr(s"CAST($tsUsCol AS BIGINT) div $hourUs").as("hour"),
      col(tsUsCol).as("__ts"), col(tieCol).as("__tie"), col(valueCol).as("__v"))
    val pick = Window.partitionBy(col(keyCol), col("hour"))
      .orderBy(col("__ts").desc, col("__tie").desc)
    val observed = byHour
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("hour"), col("__v").as("obs_value"))
    val grid = observed.groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(keyCol), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, "hour"), "left")
      .withColumn("value", last(col("obs_value"), ignoreNulls = true).over(fill))
      .withColumn("is_observed", col("obs_value").isNotNull)
      .select(col(keyCol), col("hour"), col("value"), col("is_observed"))
  }

  /** Exponentially weighted moving average per entity, in event order:
    * s₁ = v₁, sᵢ = (1−α)·sᵢ₋₁ + α·vᵢ — the smoothing every metrics
    * alerting pipeline keeps per series. EWMA is an inherently
    * SEQUENTIAL fold, so it runs as an `aggregate` HOF over each
    * entity's (ts, tie)-sorted value array: one groupBy shuffle keyed
    * on the entity, fold work linear per entity and embarrassingly
    * parallel across entities. The left-to-right fold makes the double
    * result bit-identical to DuckDB's `list_reduce` over the same
    * ordered list. An entity's history must fit one collected array —
    * the same per-key bound `sessionize`'s state carries; α is a
    * binary-exact literal (0.25) so (1−α) folds exactly. Output:
    * (keyCol, n_events, ewma). */
  /** Markov transition counts over each entity's event sequence: for
    * every consecutive (prev → next) event-type step in (ts, id) order —
    * the id tiebreak makes the sequence total, so the matrix is
    * deterministic — one count. The lag window shuffles once on the
    * entity key (high cardinality); the matrix itself is |types|² rows.
    * The empirical behavior model funnels, anomaly priors, and
    * next-event prediction baselines all read from. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(keyCol), col(typeCol),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  def ewma(events: DataFrame, keyCol: String, tsUsCol: String,
      tieCol: String, valueCol: String, alpha: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val arr = array_sort(collect_list(
      struct(col(tsUsCol).as("t"), col(tieCol).as("tie"), col(valueCol).as("v"))))
    events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), arr.as("ord"))
      .withColumn("vals", transform(col("ord"), x => x.getField("v")))
      .withColumn("ewma",
        aggregate(slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
          element_at(col("vals"), 1),
          (acc, v) => (acc * lit(1.0 - alpha)) + (v * lit(alpha))))
      .select(col(keyCol), col("n_events"), col("ewma"))
  }

  /** CUSUM change-point detection over a per-group daily count series —
    * "when did this source's volume regime shift?" The classic mean-
    * shift statistic S_i = Σ_{t≤i}(x_t − x̄) is kept EXACT by scaling
    * ×n: s_i = n·prefix_i − i·total is an integer (no mean, no
    * division), |s| is maximized with the earliest day as the
    * deterministic tie-break; s_abs_max is REPORTED as a double (wide
    * decimals never reach a final schema — engines render them
    * differently) and shift_score = s_abs_max/(n·n) is one more double
    * op from the exact decimal. The series is the collapsed
    * (group, day) count frame — windows are bounded by distinct days
    * per group, never rows. Output per group:
    * (group, n_days, total, day_star, s_abs_max, shift_score). */
  def cusumChangePoint(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = events.select(col(groupCol).as("g"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000").as("day"))
      .groupBy(col("g"), col("day")).agg(count(lit(1)).as("x"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val s = daily
      .withColumn("i", count(lit(1)).over(wCum))
      .withColumn("prefix", sum(col("x")).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("x")).over(wAll))
      .withColumn("s_abs",
        abs(dec(col("n")) * dec(col("prefix")) - dec(col("i")) * dec(col("total"))))
    val best = s.groupBy(col("g")).agg(max(col("s_abs")).as("s_abs_max"))
    def d(c: Column) = c.cast("double")
    s.join(broadcast(best), "g")
      .filter(col("s_abs") === col("s_abs_max"))
      .groupBy(col("g")).agg(
        max(col("n")).as("n_days"), max(col("total")).as("total"),
        min(col("day")).as("day_star"), max(col("s_abs")).as("s_abs_max_dec"))
      .select(col("g"), col("n_days"), col("total"), col("day_star"),
        d(col("s_abs_max_dec")).as("s_abs_max"),
        (d(col("s_abs_max_dec")) / (d(col("n_days")) * d(col("n_days"))))
          .as("shift_score"))
  }

  /** Sample autocorrelation of a per-group daily count series at lags
    * 1..maxLag — "is this source's volume weekly-periodic or
    * mean-reverting?" next to [[cusumChangePoint]]'s one-shift reading.
    * The mean never materializes: both sides scale by n, so the
    * centered term is cₜ = n·xₜ − S (exact), the lag-k numerator is
    * Σ cₜ·cₜ₊ₖ over the n−k overlapping SEQUENCE positions (lead over
    * the day-ordered series — gaps collapse, the series is the
    * observed sequence), the denominator Σ cₜ² — all DECIMAL(38,0)
    * INTERNALLY, with num/den REPORTED as doubles (wide decimals never
    * reach a final schema — engines render them differently) — and r_k
    * is ONE double division (the common n² factor cancels).
    * Output: (group, k, n_days, num, den, acf). */
  def autocorrelation(events: DataFrame, groupCol: String, tsCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 16, s"maxLag in 1..16: $maxLag")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = events.select(col(groupCol).as("g"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000").as("day"))
      .groupBy(col("g"), col("day")).agg(count(lit(1)).as("x"))
    val tot = daily.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val base = daily.join(broadcast(tot), "g")
      .withColumn("cx", dec(col("n")) * dec(col("x")) - dec(col("s")))
    val den = base.groupBy(col("g"))
      .agg(max(col("n")).as("n_days"), sum(col("cx") * col("cx")).as("den"))
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
    val lags = (1 to maxLag).map { k =>
      base.withColumn("cxl", lead(col("cx"), k).over(w))
        .filter(col("cxl").isNotNull)
        .groupBy(col("g")).agg(sum(col("cx") * col("cxl")).as("num"))
        .withColumn("k", lit(k))
    }
    def d(c: Column) = c.cast("double")
    lags.reduce(_ unionByName _)
      .join(broadcast(den), "g")
      .select(col("g"), col("k"), col("n_days"),
        d(col("num")).as("num"), d(col("den")).as("den"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(d(col("num")) / d(col("den"))).as("acf"))
  }
}
