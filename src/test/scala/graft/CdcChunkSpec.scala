package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._

/** The native one-pass CDC chunker must equal a brute-force positional
  * recomputation, partition every token exactly once, and deliver the
  * CDC guarantee that makes it useful for sub-document dedup: an
  * insertion near the front re-synchronizes, so chunks clear of the
  * edit hash identically in both copies. */
class CdcChunkSpec extends SparkSpec {

  import spark.implicits._

  private val P = TextHash.P

  private def native(texts: Seq[String], d: Int): Map[String, Seq[Long]] =
    texts.toDF("text")
      .select(col("text"), TextHash.cdcChunkHashes(col("text"), d).as("cs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  private def wordHashes(text: String): Array[Long] = {
    def ph(s: String): Long =
      if (s.isEmpty) 0L else s.codePoints.toArray.map(_.toLong)
        .reduceLeft((a, c) => (a * 31 + c) % P)
    text.split(" ", -1).map(ph)
  }

  /** Positional reference: mark boundaries, slice, fold each slice. */
  private def brute(text: String, d: Int): Seq[Long] = {
    val w = wordHashes(text)
    if (w.isEmpty) return Seq.empty
    val starts = w.indices.filter { i =>
      i == 0 || (i >= 3 && {
        val sh = ((w(i - 3) * 131 + w(i - 2)) % P * 131 + w(i - 1)) % P
        (sh * sh + 3 * sh + 7) % P % d == 0
      })
    }
    (starts :+ w.length).sliding(2).map { case Seq(a, b) =>
      val chunk = w.slice(a, b)
      chunk.reduceLeft((acc, x) => (acc * 131 + x) % P) * 131072 +
        math.min(chunk.length, 131071)
    }.toSeq
  }

  test("seeded randomized: native one-pass equals positional brute force") {
    val rnd = new scala.util.Random(13L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val texts = (1 to 50).map(_ =>
      (0 until (1 + rnd.nextInt(80))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    for (d <- Seq(2, 4, 16)) {
      val got = native(texts, d)
      texts.foreach(t => assert(got(t) === brute(t, d), s"d=$d text='$t'"))
    }
  }

  test("chunk lengths partition the token stream exactly") {
    val rnd = new scala.util.Random(17L)
    val vocab = Vector("x1", "y2", "z3", "w4", "v5")
    val texts = (1 to 30).map(_ =>
      (0 until (1 + rnd.nextInt(60))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val got = native(texts, 4)
    texts.foreach { t =>
      val n = t.split(" ", -1).length
      assert(got(t).map(_ % 131072).sum === n, s"text='$t'")
    }
  }

  test("insertion re-synchronizes: edited copy shares every chunk past the edit") {
    val rnd = new scala.util.Random(19L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val body = (0 until 400).map(_ => vocab(rnd.nextInt(vocab.size)))
    val a = body.mkString(" ")
    // insert two tokens after position 5 — every boundary decision sees
    // only a 3-token window, so chunks re-align once past the edit
    val b = (body.take(5) ++ Seq("zz", "qq") ++ body.drop(5)).mkString(" ")
    val got = native(Seq(a, b), 8)
    val distinctA = got(a).toSet
    val shared = distinctA.intersect(got(b).toSet)
    // ~60 chunks; only the few touching/preceding the resync point may
    // differ — a fixed-width chunker would lose EVERY chunk to the shift
    assert(shared.size >= distinctA.size - 4,
      s"only ${shared.size} of ${distinctA.size} chunks survive the edit")
    assert(got(a) !== got(b)) // the edited chunk itself must differ
  }

  test("edges: empty text is one empty-token chunk; single token; null") {
    val got = native(Seq("", "solo"), 16)
    assert(got("") === Seq(0L * 131072 + 1))
    assert(got("solo").length === 1)
    val n = Seq[Option[String]](None).toDF("text")
      .select(TextHash.cdcChunkHashes(col("text"), 16).as("cs"))
      .collect().head
    assert(n.isNullAt(0))
  }
}
