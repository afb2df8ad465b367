package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md) and shared
  * derived views used by the oracle-checked queries. */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // older testdata generations wrote events.ts as TIMESTAMP(NANOS), which
    // vanilla Spark rejects; the flag reads those as LongType nanos so
    // [[normalizeTs]] can convert explicitly. Harmless for micros files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize the `ts` column to session-TZ TimestampType across testdata
    * generations: INT64 TIMESTAMP(NANOS) arrives as LongType (legacy flag,
    * integer `div` keeps precision past a double's mantissa), current files
    * carry TIMESTAMP_NTZ micros (wall-clock == epoch under UTC sessions). */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      // the NTZ→TZ cast reinterprets the wall-clock in the SESSION zone, so
      // it is epoch-preserving only under UTC. Every entry point (Bench,
      // Cli, Verify, SparkSpec) pins spark.sql.session.timeZone=UTC; assert
      // it here rather than let a future non-UTC caller silently shift
      // every timestamp by the local offset.
      require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
        "normalizeTs requires spark.sql.session.timeZone=UTC (NTZ cast is zone-dependent)")
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  /** `events` with `ts` restored to a proper TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))

  /** The tweet-feature analog derived from `events` (the testdata has no
    * tweet CSV): time bucket from the event hour (P6 semantics,
    * `kmeans.java:51-67`), event_type as the categorical "language",
    * id-parity as the binary flag, bounded value bucket as the count-like
    * feature. Deterministic, and expressible identically in the DuckDB
    * oracle (see `CoreQueries.efSql`). */
  def eventFeatures(spark: SparkSession, dir: String): DataFrame = {
    val h = hour(col("ts"))
    events(spark, dir).select(
      col("event_id").as("id"),
      when(h.between(5, 12), 1)
        .when(h.between(13, 18), 2)
        .when(h > 20 || h <= 1, 3)
        .otherwise(0).as("time"),
      col("event_type").as("language"),
      (col("event_id") % 2).cast("int").as("hasVideo"),
      (floor(col("value")).cast("int") % 50).cast("int").as("numOfHashtags"),
      lit(0).as("replyCount"),
      lit(0).as("retweetCount"),
      lit(0).as("likeCount"))
  }
}

/** One engine query: the Spark implementation plus (where SQL-expressible)
  * the DuckDB oracle statement over the same parquet tables. Output columns
  * are lowercase snake_case on both sides; aggregate outputs are cast to
  * BIGINT/DOUBLE on both sides; double-valued sums go through
  * DECIMAL(28,10) so the result is order-independent and hash-identical
  * across engines. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
