package graft

import org.apache.spark.sql.functions._

/** Spark 4 Variant — the semi-structured scale path q218 exercises
  * end-to-end against the oracle. These tests pin the two mechanics the
  * registry row cannot show: the binary variant column SURVIVES a
  * parquet round trip (the storage story — payloads are parsed once at
  * ingest and land typed-extractable, not as strings to re-parse per
  * query), and schema discovery reports the union of heterogeneous
  * shapes without any declared schema. */
class VariantSpec extends SparkSpec {

  import spark.implicits._

  private def shaped = Seq(
    (1L, """{"k": 10}"""),
    (2L, """{"m": {"k": 20}, "t": "click"}"""),
    (3L, """{"k": 30}"""),
    (4L, """{"m": {"k": 40}, "t": "view"}"""))
    .toDF("id", "payload")
    .select(col("id"), parse_json(col("payload")).as("v"))

  private def extracted(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"),
      coalesce(
        try_variant_get(col("v"), "$.k", "int"),
        try_variant_get(col("v"), "$.m.k", "int")).as("k"),
      try_variant_get(col("v"), "$.t", "string").as("t"))
    .collect()
    .map(r => (r.getLong(0),
      Option(r.get(1)).map(_.asInstanceOf[Int]), // null k = readable diff, not NPE
      Option(r.get(2)).map(_.toString)))
    .toSet

  test("variant column survives a parquet round trip with identical extraction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-variant").toString
    val before = extracted(shaped)
    shaped.write.mode("overwrite").parquet(dir)
    val after = extracted(spark.read.parquet(dir))
    assert(after === before)
    assert(before === Set(
      (1L, Some(10), None), (2L, Some(20), Some("click")),
      (3L, Some(30), None), (4L, Some(40), Some("view"))))
  }

  test("schema_of_variant_agg discovers the union of heterogeneous shapes") {
    val schema = shaped.select(schema_of_variant_agg(col("v")).as("s"))
      .head().getString(0)
    // the exact union, typed and nested — a regression that drops the
    // flat generation's top-level k (or collapses the nesting) cannot
    // hide behind a substring match
    assert(schema === "OBJECT<k: BIGINT, m: OBJECT<k: BIGINT>, t: STRING>",
      s"union schema drifted: $schema")
  }
}
