package graft

import org.apache.spark.sql.functions._
import graft.operators.Maintenance

/** CDC upsert semantics (pinned edge-by-edge) + incremental-aggregate
  * maintenance proven equal to a full recompute on seeded random data. */
class MaintenanceSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
  }

  test("cdcUpsert: update replaces, delete drops, insert adds, untouched survive") {
    import spark.implicits._
    val changes = Seq(
      (2L, "B", 21.0, "U", 1L), // update key 2
      (3L, "c", 30.0, "D", 1L), // delete key 3
      (9L, "i", 90.0, "I", 1L)) // insert new key 9
      .toDF("k", "s", "v", "op", "seq")
    val got = Maintenance.cdcUpsert(base, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0), (9L, "i", 90.0)))
  }

  test("cdcUpsert: last write wins within a key; D at higher seq beats U") {
    import spark.implicits._
    val changes = Seq(
      (2L, "B1", 21.0, "U", 1L),
      (2L, "B2", 22.0, "U", 5L), // latest update wins over seq 1
      (4L, "D4", 0.0, "D", 9L), // delete arrives after...
      (4L, "X4", 44.0, "U", 3L)) // ...an earlier update: key 4 drops
      .toDF("k", "s", "v", "op", "seq")
    val got = Maintenance.cdcUpsert(base, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("cdcUpsert: replaying the same batch is idempotent") {
    import spark.implicits._
    val changes = Seq(
      (1L, "A", 11.0, "U", 1L), (3L, "c", 0.0, "D", 2L), (7L, "g", 70.0, "I", 1L))
      .toDF("k", "s", "v", "op", "seq")
    val once = Maintenance.cdcUpsert(base, changes, "k", "seq", "op")
    val twice = Maintenance.cdcUpsert(once, changes, "k", "seq", "op")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("pitJoin: each fact picks the version valid at its timestamp") {
    import spark.implicits._
    val dim = Maintenance.scd2(
      Seq((1L, 10L, 1), (1L, 20L, 2), (2L, 5L, 1)).toDF("k", "ts_us", "line"),
      "k", "ts_us", "line")
    val facts = Seq((1L, 5L), (1L, 15L), (1L, 20L), (1L, 99L), (2L, 5L))
      .toDF("k", "f_us")
    val got = Maintenance.pitJoin(facts, dim, "k", "f_us")
      .select(col("k"), col("f_us"), col("line"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // fact at 5 predates key 1's history (no row); 15 → v1; 20/99 → v2
    assert(got === Map((1L, 15L) -> 1, (1L, 20L) -> 2, (1L, 99L) -> 2, (2L, 5L) -> 1))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val neu = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val got = Maintenance.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("mergePartials over 3 delta slices == one full recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000) / 100.0, i % 3) }
    val df = rows.toDF("g", "x", "slice")
    def partial(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("g"))
      .agg(sum(col("x").cast("decimal(20,2)")).as("sx"), count(lit(1)).as("n"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
    val merged = Maintenance.mergePartials(
      (0 until 3).map(s => partial(df.filter(col("slice") === s)))
        .reduce(_ unionByName _),
      Seq("g"), Seq("sx", "n"), Seq("mn"), Seq("mx"))
    val full = partial(df)
    val a = merged.select(col("g"), col("sx").cast("double"), col("n"), col("mn"), col("mx"))
      .collect().map(_.toSeq).toSet
    val b = full.select(col("g"), col("sx").cast("double"), col("n"), col("mn"), col("mx"))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("incrementalAggMaintain: inserts create keys, full deletion drops them, partial updates merge") {
    import spark.implicits._
    val state = Seq(("a", 2L, BigDecimal("30.00")), ("b", 1L, BigDecimal("5.00")))
      .toDF("k", "n", "total")
    val changes = Seq(
      ("a", "delete", BigDecimal("10.00")), // a: 2 -> 1, 30 -> 20
      ("b", "delete", BigDecimal("5.00")),  // b fully deleted -> dropped
      ("c", "insert", BigDecimal("7.50")),  // new key
      ("c", "insert", BigDecimal("2.50"))
    ).toDF("k", "op", "v")
    val out = Maintenance.incrementalAggMaintain(state, changes, "k", "op", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).doubleValue))).toMap
    assert(out === Map("a" -> ((1L, 20.0)), "c" -> ((2L, 10.0))))
  }

  test("rangeChecksums: only ranges containing a changed row flip their checksum") {
    import spark.implicits._
    val base = (1L to 400L).map(i => (i, s"row $i", i % 7)).toDF("id", "payload", "tag")
    val tampered = base.withColumn("payload",
      when(col("id") === 250L, lit("changed")).otherwise(col("payload")))
    val a = Maintenance.rangeChecksums(base, "id", 100L, Seq("payload", "tag"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val b = Maintenance.rangeChecksums(tampered, "id", 100L, Seq("payload", "tag"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a.keySet === b.keySet && a.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(a.filter { case (k, v) => b(k) != v }.keySet === Set(2L),
      "row 250 lives in bucket 2; every other range checksum must hold")
  }
}
