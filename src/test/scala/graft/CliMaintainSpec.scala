package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end `Cli maintain`: the table-maintenance tier driven the way
  * a maintenance service would — a compaction plan from a file
  * manifest, a snapshot diff exercising all four change classes, and a
  * checksum/checksum-diff round trip that localizes a tampered row to
  * its key range. */
class CliMaintainSpec extends SparkSpec {

  test("sketch quantiles + overlap run end-to-end from parquet to report files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clisketch").toString
    (1 to 4000).map(i => (s"s${i % 2}", (i % (900 + 100 * (i % 2))).toLong))
      .toDF("src", "uid").write.parquet(s"$dir/t")

    Cli.run(spark, List("sketch", "quantiles", s"$dir/t", s"$dir/q",
      "--group-col", "src", "--value-col", "uid", "--ps", "0.5,0.9", "--k", "128"))
    val q = spark.read.parquet(s"$dir/q/quantiles").collect()
    assert(q.length === 4, "2 groups x 2 ps")
    assert(q.forall(r => r.getLong(3) === 2000L), "per-group exact n carried")

    Cli.run(spark, List("sketch", "overlap", s"$dir/t", s"$dir/o",
      "--group-col", "src", "--value-col", "uid"))
    val o = spark.read.parquet(s"$dir/o/overlap").collect()
    assert(o.length === 1)
    val r = o.head
    assert((r.getString(0), r.getString(1)) === ("s0", "s1"))
    // s0 = {0..899}, s1 = {0..999}: union truth 1000, overlap truth 900
    assert(math.abs(r.getDouble(4) - 1000) <= 400, s"union est ${r.getDouble(4)}")
  }

  test("hll store lifecycle: build + appends serve EXACTLY the direct sketch of all rows; compact preserves it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clihll").toString
    def part(lo: Int, hi: Int) =
      (lo until hi).map(i => (s"g${i % 3}", (i % (400 + 100 * (i % 3))).toLong))
    part(0, 3000).toDF("g", "uid").write.parquet(s"$dir/base")
    part(3000, 4000).toDF("g", "uid").write.parquet(s"$dir/b1")
    part(4000, 5000).toDF("g", "uid").write.parquet(s"$dir/b2")

    Cli.run(spark, List("sketch", "hll-build", s"$dir/base", s"$dir/sk"))
    Cli.run(spark, List("sketch", "hll-append", s"$dir/b1", s"$dir/sk"))
    Cli.run(spark, List("sketch", "hll-append", s"$dir/b2", s"$dir/sk"))

    def report() = graft.operators.QualityChecks.hllStoreReport(spark, s"$dir/sk")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // register merge is lossless: store == one-shot sketch of ALL rows
    val direct = graft.operators.QualityChecks
      .hllDistinct(part(0, 5000).toDF("g", "uid"), "g", "uid")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(report() === direct, "build + 2 appends == direct sketch, bit for bit")

    Cli.run(spark, List("sketch", "hll-compact", s"$dir/sk"))
    assert(report() === direct, "compact preserves the merged registers exactly")
    assert(new java.io.File(s"$dir/sk/v1/_GRAFT_OK").exists, "compact commits v1")
    assert(new java.io.File(s"$dir/sk/v0").exists, "previous version retained one cycle")
    // appends after compact land in the new current version
    Cli.run(spark, List("sketch", "hll-append", s"$dir/b1", s"$dir/sk"))
    assert(report() === direct, "re-appending seen rows changes nothing (max is idempotent)")
  }

  test("hll store compact folds a late append into the old version instead of dropping it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clihllrace").toString
    def rows(lo: Int, hi: Int) = (lo until hi).map(i => (s"g${i % 3}", i.toLong))
    rows(0, 2000).toDF("g", "uid").write.parquet(s"$dir/base")
    Cli.run(spark, List("sketch", "hll-build", s"$dir/base", s"$dir/sk"))
    Cli.run(spark, List("sketch", "hll-compact", s"$dir/sk")) // v0 + v1 exist

    // Simulate the race ADVICE flagged: an append that resolved v0 as
    // current WHILE the compact above was committing v1 lands its
    // register files in v0 after the merge read it. Reproduce the end
    // state deterministically by writing the batch's registers straight
    // into v0 (exactly what hllStoreAppend does to whichever version it
    // resolved).
    val late = rows(2000, 3000).toDF("g", "uid")
    graft.operators.QualityChecks.hllRegisters(
        late.select(col("g").cast("string").as("g"), col("uid")), Seq("g"), "uid")
      .write.mode("append").parquet(s"$dir/sk/v0")

    // The NEXT compact deletes v0 — pre-fix it read only v1, so the late
    // registers were dropped and estimates undercounted. Post-fix compact
    // merges every committed version, so v0's late files fold into v2.
    Cli.run(spark, List("sketch", "hll-compact", s"$dir/sk"))
    val report = graft.operators.QualityChecks.hllStoreReport(spark, s"$dir/sk")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val direct = graft.operators.QualityChecks
      .hllDistinct(rows(0, 3000).toDF("g", "uid"), "g", "uid")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(report === direct,
      "late append into the retained old version survives its deletion, bit for bit")
    assert(!new java.io.File(s"$dir/sk/v0").exists, "old version still dropped")
    assert(new java.io.File(s"$dir/sk/v2/_GRAFT_OK").exists, "compact committed v2")
  }

  /** Round-11 verdict #7a: one status verb across the persisted-index
    * forms. Detection + drift verdict per form; empty dirs fail loudly. */
  test("index-status detects each index form and reports its drift verdict") {
    import spark.implicits._
    val tables = Seq("graft_idx_bands", "graft_idx_sets", "graft_idx_bandcensus",
      "graft_cidx_ivfcells", "graft_cidx_ivfcentroids", "graft_cidx_ivfcensus",
      "graft_cidx_ivfcoarse")
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val dir = Files.createTempDirectory("cliidxstatus").toString
    try {
      // text band index with census -> "band ... ok"
      Seq((1L, "alpha beta gamma delta epsilon zeta", "w"),
          (2L, "one two three four five six seven", "w"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$dir/corpus")
      Cli.run(spark, List("bandindex", s"$dir/corpus", s"$dir/bidx", "--buckets", "2"))
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        Cli.run(spark, List("index-status", s"$dir/bidx", "--buckets", "2"))
      }
      val s1 = out.toString
      assert(s1.contains("index-status band") && s1.contains("ok"), s1)

      // cell index at another location -> "cell ... ok"
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.writeCellIndex(emb, "graft_cidx",
        buckets = 2, location = Some(s"$dir/cidx"))
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val out2 = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out2)) {
        Cli.run(spark, List("index-status", s"$dir/cidx", "--buckets", "2"))
      }
      val s2 = out2.toString
      assert(s2.contains("index-status cell") && s2.contains("ok"), s2)

      // --json true: one machine-readable line per form (round-12 #7a)
      val out3 = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out3)) {
        Cli.run(spark, List("index-status", s"$dir/cidx", "--buckets", "2",
          "--json", "true"))
      }
      val s3 = out3.toString.trim
      assert(s3.startsWith("""{"form":"cell"""") && s3.contains(""""stale":false"""), s3)

      // nothing there -> loud
      val e = intercept[IllegalArgumentException] {
        Cli.run(spark, List("index-status", s"$dir/empty"))
      }
      assert(e.getMessage.contains("no graft index"))
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("maintain compact-plan bins a file manifest to the target size") {
    import spark.implicits._
    val dir = Files.createTempDirectory("climaintain").toString
    // 6 files, 100 bytes each, target 250: prefix sums 0,100,...,500
    // div 250 -> bins 0,0,0,1,1,2
    (1L to 6L).map(i => (i, 100L)).toDF("file_id", "bytes")
      .write.parquet(s"$dir/manifest")
    Cli.run(spark, List("maintain", "compact-plan", s"$dir/manifest",
      s"$dir/out", "--target", "250"))
    val bins = spark.read.parquet(s"$dir/out/compaction_plan")
      .orderBy("bin").collect()
      .map(r => (r.getLong(r.fieldIndex("bin")),
        r.getLong(r.fieldIndex("n_files")),
        r.getLong(r.fieldIndex("total_bytes"))))
    assert(bins.toSeq === Seq((0L, 3L, 300L), (1L, 2L, 200L), (2L, 1L, 100L)))
  }

  test("maintain compact-plan resolves columns by name, not position, and fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("climaintain2").toString
    // column order swapped vs (id, bytes) — positional guessing would have
    // silently binned on file_id as the byte count
    (1L to 4L).map(i => (100L, i)).toDF("bytes", "file_id")
      .write.parquet(s"$dir/swapped")
    Cli.run(spark, List("maintain", "compact-plan", s"$dir/swapped",
      s"$dir/out1", "--target", "250"))
    val total = spark.read.parquet(s"$dir/out1/compaction_plan")
      .agg(org.apache.spark.sql.functions.sum("total_bytes")).collect().head.getLong(0)
    assert(total === 400L, "must sum the `bytes` column, not the positional second column")

    // single-column manifest: must fail with a usage message naming the
    // flag, not an IndexOutOfBoundsException
    Seq(1L, 2L).toDF("file_id").write.parquet(s"$dir/onecol")
    val e = intercept[RuntimeException] {
      Cli.run(spark, List("maintain", "compact-plan", s"$dir/onecol", s"$dir/out2"))
    }
    assert(e.getMessage.contains("--bytes-col"), s"unhelpful error: ${e.getMessage}")

    // explicit flag pointing at a missing column: same loud failure
    val e2 = intercept[RuntimeException] {
      Cli.run(spark, List("maintain", "compact-plan", s"$dir/swapped",
        s"$dir/out3", "--bytes-col", "nope"))
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("maintain diff classifies added / removed / changed / unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("climaintain").toString
    Seq((1L, "same", 10L), (2L, "old-text", 20L), (3L, "gone", 30L))
      .toDF("id", "payload", "tag").write.parquet(s"$dir/old")
    Seq((1L, "same", 10L), (2L, "new-text", 20L), (4L, "fresh", 40L))
      .toDF("id", "payload", "tag").write.parquet(s"$dir/new")
    Cli.run(spark, List("maintain", "diff", s"$dir/old", s"$dir/new",
      s"$dir/out", "--keys", "id", "--cols", "payload,tag"))
    val classes = spark.read.parquet(s"$dir/out/diff")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(classes === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("maintain checksum + checksum-diff localize a tampered row to its range") {
    import spark.implicits._
    val dir = Files.createTempDirectory("climaintain").toString
    val base = (1L to 400L).map(i => (i, s"row $i", i % 7))
      .toDF("id", "payload", "tag")
    base.write.parquet(s"$dir/base")
    base.withColumn("payload",
        when(col("id") === 250L, lit("tampered")).otherwise(col("payload")))
      .write.parquet(s"$dir/tampered")
    Cli.run(spark, List("maintain", "checksum", s"$dir/base", s"$dir/a",
      "--key-col", "id", "--range-width", "100", "--cols", "payload,tag"))
    Cli.run(spark, List("maintain", "checksum", s"$dir/tampered", s"$dir/b",
      "--key-col", "id", "--range-width", "100", "--cols", "payload,tag"))
    Cli.run(spark, List("maintain", "checksum-diff", s"$dir/a/checksums",
      s"$dir/b/checksums", s"$dir/out"))
    val bad = spark.read.parquet(s"$dir/out/checksum_diff")
      .collect().map(_.getLong(0)).toSeq
    // id 250 lives in bucket 250 div 100 = 2 — the ONLY flagged range
    assert(bad === Seq(2L))
  }
}
