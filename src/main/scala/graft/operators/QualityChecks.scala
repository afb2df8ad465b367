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
}
