package graft

import java.nio.file.Files

/** End-to-end `Cli dedup`: a corpus with an exact duplicate and a
  * near-duplicate collapses to its canonical survivors on disk. */
class CliDedupSpec extends SparkSpec {

  test("dedup subcommand keeps canonical docs only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clidedup").toString
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    Seq(
      (1L, base, "s"), // canonical of the near-dup pair
      (2L, base + " w13", "s"), // near-dup of 1 -> removed
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8", "s"), // unique -> kept
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8", "s")) // exact dup of 3 -> removed
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/corpus")
    Cli.run(spark, List("dedup", s"$dir/corpus", s"$dir/out"))
    val kept = spark.read.parquet(s"$dir/out/deduped")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }
}
