package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TweetFeatures

/** Tweet-CSV ingest: raw text lines → typed feature records.
  *
  * Re-expresses the reference's map-only ingest job (`kmeans.java:117-164`)
  * as a single narrow Spark stage: `spark.read.text` → regex split →
  * filter/derive/project → Parquet. No shuffle anywhere — matching the
  * reference's `setNumReduceTasks(0)` shape (`kmeans.java:146`) for free.
  *
  * The positional split uses the exact lookahead regex `,(?!\s)` of
  * `kmeans.java:30-31` (a comma followed by whitespace stays inside the
  * field), which `spark.read.csv`'s single-char delimiter cannot express.
  */
object TweetIngest {

  /** Java `Integer.parseInt` acceptance as a Column gate: optional sign,
    * digits only — no whitespace trimming (which Spark's `try_cast` would
    * silently allow, an undocumented deviation flagged in round-1 advice).
    * try_cast after the gate still yields null on int overflow, mirroring
    * parseInt-throws. */
  private def parseIntStrict(c: Column): Column =
    when(c.rlike("^[+-]?[0-9]+$"), c.try_cast("int"))

  /** P6/F5 — categorical bucket of the publish hour (`kmeans.java:51-67`):
    * 5..12 → 1, 13..18 → 2, 21..23 or 0..1 → 3, else (2-4, 19-20,
    * malformed) → 0. Faithful guards: the hour parses ONLY when the time
    * field has exactly 3 colon-separated parts (`kmeans.java:55`) and the
    * first part is parseInt-acceptable; anything else falls to 0, the
    * reference's swallow-and-default catch (`kmeans.java:65-67`).
    */
  def timeBucket(time: Column): Column = {
    val parts = split(time, ":")
    val h = when(size(parts) === 3, parseIntStrict(element_at(parts, 1)))
    when(h.isNull, 0)
      .when(h.between(5, 12), 1)
      .when(h.between(13, 18), 2)
      .when(h > 20 || h <= 1, 3)
      .otherwise(0)
  }

  /** P5 — hashtag count (`kmeans.java:34-49`): a digits-only field
    * (`matches("[0-9]+")`, `kmeans.java:38` — unsigned, no sign or
    * whitespace) parses through, `"[]"` → 0, anything else counts
    * comma-separated elements. An empty string yields 1, faithfully
    * matching Java's `"".split(",").length`. Digits-only int OVERFLOW
    * (where the reference's unguarded parseInt would crash the task)
    * falls to the element count — intended-semantics fix, same family as
    * SURVEY §2.8.
    */
  def hashtagCount(h: Column): Column =
    coalesce(when(h.rlike("^[0-9]+$"), h.try_cast("int")),
      when(h === "[]", 0).otherwise(size(split(h, ","))))

  /** P7 — hasVideo normalization (`kmeans.java:82-87`): digits-only field
    * (`matches("[0-9]+")`) passes through, literal `"True"` → 1,
    * anything else → 0. */
  def hasVideoFlag(v: Column): Column =
    coalesce(when(v.rlike("^[0-9]+$"), v.try_cast("int")),
      when(v === "True", 1).otherwise(0))

  /** P8 — parse-or-zero counts (`kmeans.java:89-109`): bare parseInt in a
    * swallow-and-default try/catch — signed accepted, whitespace not. */
  def parseOrZero(c: Column): Column = coalesce(parseIntStrict(c), lit(0))

  /** S1+S2+P1-P9: read raw tweet CSV text and derive the feature table.
    *
    * Filters: empty lines (P1, `kmeans.java:26-28`), arity < 24 (P2,
    * `kmeans.java:35-37`), non-numeric id (P3, `kmeans.java:71-75`).
    * Consumed positions (0-indexed): 0 id, 4 time, 11 language,
    * 15-17 counts, 18 hashtags, 23 hasVideo.
    */
  def ingest(spark: SparkSession, path: String): Dataset[TweetFeatures] = {
    import spark.implicits._
    val f = col("f")
    spark.read.text(path)
      .filter(length(col("value")) > 0)
      .select(split(col("value"), ",(?!\\s)").as("f"))
      .filter(size(f) > 23)
      .select(
        element_at(f, 1).try_cast("long").as("id"),
        hashtagCount(element_at(f, 19)).as("numOfHashtags"),
        element_at(f, 12).as("language"),
        hasVideoFlag(element_at(f, 24)).as("hasVideo"),
        parseOrZero(element_at(f, 16)).as("replyCount"),
        parseOrZero(element_at(f, 17)).as("retweetCount"),
        parseOrZero(element_at(f, 18)).as("likeCount"),
        timeBucket(element_at(f, 5)).as("time"))
      .filter(col("id").isNotNull)
      .as[TweetFeatures]
  }

  /** S3/S4 analog — persist the feature table. Parquet replaces HBase:
    * columnar + min/max stats give us pruning the rowkey design was
    * hand-building (`kmeans.java:70-72`). Sorting within partitions by id
    * tightens the per-row-group id stats so id-range predicates (the S5
    * prefix-scan analog) prune row groups.
    */
  def writeFeatures(features: Dataset[TweetFeatures], path: String): Unit =
    features.sortWithinPartitions("id").write.mode("overwrite").parquet(path)

  def readFeatures(spark: SparkSession, path: String): Dataset[TweetFeatures] = {
    import spark.implicits._
    spark.read.parquet(path).as[TweetFeatures]
  }

  /** S5 — prefix-range scan analog. The reference pads decimal id prefixes
    * to 19-digit rowkey ranges and scans each slice (`Cluster.java:66-75`);
    * on Parquet the same semantics is a plain id-range predicate that
    * Catalyst pushes to the scan (row-group pruning via min/max stats).
    */
  def idRange(features: DataFrame, prefix: Long, digits: Int = 19): DataFrame = {
    val width = digits - prefix.toString.length
    val lo = prefix * math.pow(10, width).toLong
    val hi = lo + 2L * math.pow(10, width - 1).toLong - 1 // [prefix]1 9^(n-1)
    features.filter(col("id").between(lo, hi))
  }
}

/** S7/S8 — inter-job assignment TSV (`id \t cluster`) reader/writer
  * (`Cluster.java:181,199-205`). Kept for CLI parity; in-engine stages pass
  * DataFrames directly. */
object AssignmentIO {
  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("cluster", IntegerType)))

  /** Reads `id \t cluster` lines, dropping malformed (<2 field) rows
    * (P4, `Cluster.java:200-202`). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(schema).csv(path)
      .filter(col("id").isNotNull && col("cluster").isNotNull)

  def write(assignments: DataFrame, path: String): Unit =
    assignments.select(col("id"), col("cluster"))
      .write.mode("overwrite").option("sep", "\t").csv(path)
}
