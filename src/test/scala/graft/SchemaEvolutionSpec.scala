package graft

import org.apache.spark.sql.functions._

/** Schema evolution across parquet file generations: a 100-TB ingest
  * directory accumulates files whose schemas drift (columns added over
  * months), and the old files are never rewritten. `mergeSchema` must
  * union the footers — every column any generation carries, NULL
  * backfill where a file predates it — and the default single-footer
  * read is the documented pitfall the merged read exists to avoid. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions generations; old files read new columns as NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // generation 1: (id, lang) — the original ingest schema
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
      .write.mode("overwrite").parquet(dir)
    // generation 2: quality added months later; old files untouched
    Seq((10L, "fr", 0.9), (11L, "en", 0.4)).toDF("id", "lang", "quality")
      .write.mode("append").parquet(dir)

    val merged = graft.sources.ColumnarIO.readMerged(spark, dir)
    assert(merged.schema.fieldNames.toSet === Set("id", "lang", "quality"),
      "merged schema must be the union of all generations' footers")
    val rows = merged.collect()
    assert(rows.length === 5, "every generation's rows present exactly once")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // null backfill: generation-1 rows carry no quality
    Seq(1L, 2L, 3L).foreach(id =>
      assert(byId(id).isNullAt(byId(id).fieldIndex("quality")),
        s"gen-1 row $id must read quality as NULL"))
    assert(byId(10L).getDouble(byId(10L).fieldIndex("quality")) === 0.9)
    // and the merged read still aggregates both generations correctly
    val agg = merged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), count(col("quality")).as("scored"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg("en") === ((3L, 1L)) && agg("de") === ((1L, 0L)) && agg("fr") === ((1L, 1L)))
  }

  test("the default read binds one footer — the pitfall the merged read avoids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve2").toString
    Seq((1L, "en")).toDF("id", "lang").write.mode("overwrite").parquet(dir)
    Seq((2L, "fr", 0.5)).toDF("id", "lang", "quality")
      .write.mode("append").parquet(dir)
    // WHICH footer wins is undefined (file listing order) — the pinned
    // fact is only that the default read does NOT union: it either
    // misses `quality` or reads it; it must never produce a schema
    // outside the two footers, and the row COUNT is always complete.
    val plain = spark.read.parquet(dir)
    val names = plain.schema.fieldNames.toSet
    assert(names === Set("id", "lang") || names === Set("id", "lang", "quality"))
    assert(plain.count() === 2)
  }
}
