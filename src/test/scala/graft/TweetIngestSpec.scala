package graft

import graft.model.TweetFeatures
import graft.sources.TweetIngest
import java.nio.file.Files

/** S1/S2 + P1-P9 ingest semantics against fixture CSV lines, including
  * every edge case the reference's parse handles (`kmeans.java:23-115`). */
class TweetIngestSpec extends SparkSpec {

  /** A 24-field line with the consumed positions filled. */
  private def line(id: String, time: String, lang: String, reply: String,
      retweet: String, like: String, hashtags: String, video: String): String = {
    val f = Array.fill(24)("x")
    f(0) = id; f(4) = time; f(11) = lang; f(15) = reply
    f(16) = retweet; f(17) = like; f(18) = hashtags; f(23) = video
    f.mkString(",")
  }

  private def ingest(lines: String*): Seq[TweetFeatures] = {
    val dir = Files.createTempDirectory("tweets").toFile
    val file = new java.io.File(dir, "part.csv")
    Files.write(file.toPath, lines.mkString("\n").getBytes)
    TweetIngest.ingest(spark, file.getAbsolutePath).collect().toSeq.sortBy(_.id)
  }

  test("happy row: all features derived") {
    val rows = ingest(line("42", "08:30:00", "en", "3", "7", "11", "5", "1"))
    assert(rows === Seq(TweetFeatures(42L, 5, "en", 1, 3, 7, 11, 1)))
  }

  test("P1-P3 filters: empty line, short row, non-numeric id all dropped") {
    val rows = ingest(
      "",
      "only,three,fields",
      line("not-a-number", "08:30:00", "en", "1", "1", "1", "1", "1"),
      line("7", "09:00:00", "tr", "0", "0", "0", "0", "0"))
    assert(rows.map(_.id) === Seq(7L))
  }

  test("P5 hashtag derivation: int passthrough, [], comma list, empty") {
    val rows = ingest(
      line("1", "08:00:00", "en", "0", "0", "0", "12", "0"),
      line("2", "08:00:00", "en", "0", "0", "0", "[]", "0"),
      line("3", "08:00:00", "en", "0", "0", "0", "a;b;c", "0"))
    assert(rows.map(_.numOfHashtags) === Seq(12, 0, 1))
  }

  test("P5: comma-separated hashtag list counts elements (lookahead keeps ', ' inside the field)") {
    // "tag1, tag2, tag3" — commas followed by space do NOT split fields
    // (regex `,(?!\s)` of kmeans.java:30-31) but DO count as list elements.
    val rows = ingest(line("5", "08:00:00", "en", "0", "0", "0", "t1, t2, t3", "0"))
    assert(rows.head.numOfHashtags === 3)
  }

  test("P6 time buckets incl. the reference's gaps (kmeans.java:51-67)") {
    val cases = Seq(
      "05:00:00" -> 1, "12:59:59" -> 1, // 5..12 → 1
      "13:00:00" -> 2, "18:30:00" -> 2, // 13..18 → 2
      "21:00:00" -> 3, "23:59:00" -> 3, "00:10:00" -> 3, "01:00:00" -> 3,
      "02:00:00" -> 0, "04:00:00" -> 0, // gap
      "19:00:00" -> 0, "20:59:00" -> 0, // gap
      "garbage" -> 0) // malformed → 0 via null-safe cast
    val rows = ingest(cases.zipWithIndex.map { case ((t, _), i) =>
      line(i.toString, t, "en", "0", "0", "0", "0", "0")
    }: _*)
    assert(rows.map(_.time) === cases.map(_._2))
  }

  test("P7 hasVideo: int passthrough, True literal, junk → 0") {
    val rows = ingest(
      line("1", "08:00:00", "en", "0", "0", "0", "0", "1"),
      line("2", "08:00:00", "en", "0", "0", "0", "0", "True"),
      line("3", "08:00:00", "en", "0", "0", "0", "0", "False"),
      line("4", "08:00:00", "en", "0", "0", "0", "0", "7"))
    assert(rows.map(_.hasVideo) === Seq(1, 1, 0, 7))
  }

  test("P8 parse-or-zero counts") {
    val rows = ingest(line("1", "08:00:00", "en", "junk", "", "-5", "0", "0"))
    assert((rows.head.replyCount, rows.head.retweetCount, rows.head.likeCount) === ((0, 0, -5)))
  }

  test("parseInt fidelity: whitespace rejected, sign-rules per field (round-1 advice)") {
    val rows = ingest(
      // reply "+7": parseInt accepts the sign → 7
      line("1", "08:00:00", "en", "+7", "0", "0", "0", "0"),
      // time "7" (1 part) and "7:30" (2 parts) fail the t.length==3 guard → 0
      line("2", "7", "en", "0", "0", "0", "0", "0"),
      line("3", "7:30", "en", "0", "0", "0", "0", "0"),
      // time "+8:00:00": parseInt accepts the sign → hour 8 → bucket 1
      line("4", "+8:00:00", "en", "0", "0", "0", "0", "0"),
      // hashtags "-3": fails the unsigned [0-9]+ gate → element count (1)
      // hasVideo "+1": fails [0-9]+ and isn't "True" → 0
      line("5", "08:00:00", "en", "0", "0", "0", "-3", "+1"))
    assert(rows.head.replyCount === 7)
    assert(rows.map(_.time) === Seq(1, 0, 0, 1, 1))
    assert((rows(4).numOfHashtags, rows(4).hasVideo) === ((1, 0)))
    // whitespace-padded fields can't survive the `,(?!\s)` line split, so
    // pin Java-parseInt whitespace rejection at the function level:
    // " 5" → 0 where try_cast alone would trim and accept
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val unit = Seq(" 5", "5 ", "+6", "junk").toDF("c")
      .select(TweetIngest.parseOrZero(col("c")).as("v"))
      .collect().map(_.getInt(0)).toSeq
    assert(unit === Seq(0, 0, 6, 0))
  }

  test("assignment TSV round-trip drops malformed rows (P4)") {
    import graft.sources.AssignmentIO
    val dir = Files.createTempDirectory("assign").toFile
    val path = new java.io.File(dir, "out").getAbsolutePath
    import spark.implicits._
    AssignmentIO.write(Seq((1L, 0), (2L, 1)).toDF("id", "cluster"), path)
    // inject malformed lines alongside the engine-written files
    // (P4, Cluster.java:200-202: short / junk rows are skipped)
    Files.write(new java.io.File(path, "part-junk.csv").toPath,
      "malformed\n3\tnot-an-int\n\t\n4\t1\n".getBytes)
    val back = AssignmentIO.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(back.toSeq === Seq((1L, 0), (2L, 1), (4L, 1)))
  }

  test("S5 id-range scan reproduces the prefix padding (Cluster.java:66-75)") {
    import spark.implicits._
    // prefix 135 pads to lo = [135]0^16 and hi = [135]1 9^15
    // (Cluster.java:66-75 builds "[prefix]000..0" / "[prefix]199..9")
    val lo = 1350000000000000000L
    val hi = 1351999999999999999L
    val df = Seq(lo, hi, hi + 1, 1359999999999999999L, 135L, lo - 1).toDF("id")
    val got = TweetIngest.idRange(df, 135L).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(lo, hi))
  }
}
