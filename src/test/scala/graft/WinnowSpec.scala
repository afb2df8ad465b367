package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._

/** The native monotonic-deque winnow must equal the brute-force windowed
  * minima on random inputs, and handle the short-doc edges. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  private def winnow(texts: Seq[String], w: Int): Map[String, Seq[Long]] =
    texts.toDF("text")
      .select(col("text"), TextHash.winnowHashes(col("text"), w).as("fps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  private def shingles(text: String): Seq[Long] = {
    val P = TextHash.P
    def ph(s: String): Long =
      if (s.isEmpty) 0L else s.codePoints.toArray.map(_.toLong)
        .reduceLeft((a, c) => (a * 31 + c) % P)
    val wh = text.split(" ", -1).map(ph)
    if (wh.length < 3) Seq.empty
    else (0 until wh.length - 2).map(i => ((wh(i) * 131 + wh(i + 1)) % P * 131 + wh(i + 2)) % P)
  }

  private def brute(text: String, w: Int): Seq[Long] = {
    val sh = shingles(text)
    if (sh.isEmpty) Seq.empty
    else if (sh.length <= w) Seq(sh.min)
    else (0 to sh.length - w).map(i => sh.slice(i, i + w).min).distinct.sorted
  }

  test("short docs: no shingles -> empty; <= w shingles -> global min") {
    val out = winnow(Seq("one two", "a b c d e f"), 4)
    assert(out("one two") === Seq.empty)
    assert(out("a b c d e f") === Seq(shingles("a b c d e f").min))
  }

  test("seeded randomized: deque equals brute-force windowed minima") {
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val texts = (1 to 40).map(_ =>
      (0 until (3 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    for (w <- Seq(1, 2, 4, 7)) {
      val got = winnow(texts, w)
      texts.foreach(t => assert(got(t) === brute(t, w), s"w=$w text='$t'"))
    }
  }
}
