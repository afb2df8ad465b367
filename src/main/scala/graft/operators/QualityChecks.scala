package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling for pipeline gates (the Deequ-style checks a
  * 100 TB ingest runs before promoting a snapshot): one aggregation pass
  * computes all requested metrics (single job, map-side partials), rather
  * than one action per check.
  */
object QualityChecks {

  /** One row per profiled column:
    * (col_name, n_rows, n_nulls, null_frac, n_distinct, is_unique) where
    * is_unique ⇔ distinct non-nulls + nulls account for every row.
    * Exact distinct counts — swap in approx_count_distinct at extreme
    * widths. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val total = count(lit(1))
    val metrics: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"))
    } :+ total.as("__total")
    val row = df.agg(metrics.head, metrics.tail: _*)
    val out = cols.map { c =>
      struct(lit(c).as("col_name"), col("__total").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        (col(s"__nulls_$c").cast("double") / col("__total").cast("double")).as("null_frac"),
        col(s"__distinct_$c").as("n_distinct"),
        (col(s"__distinct_$c") + col(s"__nulls_$c") === col("__total")).as("is_unique"))
    }
    row.select(explode(array(out: _*)).as("m")).select("m.*")
  }

  /** ANALYZE-style stats profile — [[profile]] plus min/max, the pass a
    * catalog runs to seed data-skipping metadata (Delta/Iceberg column
    * stats, Hive ANALYZE TABLE). Numeric columns report min/max as
    * DOUBLE (exact for ids below 2^53 and 2-decimal money columns;
    * pre-project timestamps to epoch micros), string columns
    * lexicographically — two typed slots instead of a stringified value
    * whose rendering differs across engines. Still ONE aggregate over
    * the table (multi-countDistinct plans as scan + Expand: cost grows
    * with column count, never with extra passes), unpivoted
    * executor-side with `explode`. */
  def statsProfile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      numericCols.flatMap(c => Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))) ++
      stringCols.flatMap(c => Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).as(s"__smin_$c"),
        max(col(c)).as(s"__smax_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = numericCols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"),
        col(s"__max_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))) ++
      stringCols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"__smin_$c").as("min_str"),
        col(s"__smax_$c").as("max_str")))
    wide.select(col("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
  }

  /** Per-group z-score outliers over a 2-decimal measure column: rows
    * whose |value − μ_g| / σ_g exceeds `threshold` (σ = sample stddev).
    * The metric-drift / sensor-glitch gate every ingest runs per slice.
    *
    * Cross-engine determinism: Σv and Σv² accumulate in DECIMAL (exact,
    * order-independent — a raw double sum would depend on partition
    * order), and only the final per-group μ/σ² arithmetic happens in
    * doubles, in one fixed operation order; `sqrt` is correctly rounded
    * everywhere. Shape: one groupBy on the slice key (map-side
    * partial), stats broadcast back (|groups| rows), one row-wise
    * filter — two scans, no window. Groups with fewer than 2 rows or
    * zero variance yield no outliers. */
  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCols: Seq[String], threshold: Double): DataFrame = {
    val dv = col(valueCol).cast("decimal(9,2)")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(dv).as("s1"),
      sum(dv * dv).as("s2"))
    val nD = col("n").cast("double")
    val s1D = col("s1").cast("double")
    val mean = s1D / nD
    val variance = (col("s2").cast("double") - ((s1D * s1D) / nD)) / (nD - lit(1.0))
    val enriched = df.join(broadcast(stats), groupCol)
      .filter(col("n") > 1)
      .withColumn("grp_mean", mean)
      .withColumn("grp_var", variance)
      .filter(col("grp_var") > 0.0)
      .withColumn("z", (col(valueCol) - col("grp_mean")) / sqrt(col("grp_var")))
      .filter(abs(col("z")) > threshold)
    enriched.select(
      (idCols.map(col) :+ col(groupCol) :+ col(valueCol) :+ col("z")): _*)
  }
}
