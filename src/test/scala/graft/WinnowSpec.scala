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

  /** Boilerplate corpus: every doc ends with the same license-footer run
    * (one ubiquitous fingerprint family, df = corpus size), and five docs
    * have a true near-dup copy (first token dropped — shares the doc's
    * RARE unique-content run, df = 2). The df cap must kill the
    * boilerplate collision group (quadratic candidates, zero signal)
    * without losing any true pair. */
  test("winnowPairs hot-fingerprint cap: candidates drop, recall holds until cap < 2") {
    val rnd = new scala.util.Random(11L)
    val footer = "licensed under the apache license version two point zero see the file"
    val docs = (0 until 30).map { i =>
      val body = (0 until 25).map(_ => f"w${rnd.nextInt(100000)}%05d").mkString(" ")
      (i.toLong, s"$body $footer", "src")
    }
    val nearDups = docs.take(5).map { case (id, text, s) =>
      (id + 1000L, text.substring(text.indexOf(' ') + 1), s)
    }
    val corpus = spark.createDataFrame(docs ++ nearDups)
      .toDF("doc_id", "text", "source")

    // candidate volume before the verify, by cap — the quantity the cap bounds
    def candidates(cap: Int): Long = {
      val fps = corpus.select(col("doc_id"),
        explode(array_distinct(TextHash.winnowHashes(col("text"), 4))).as("fp"))
      val rare = fps.groupBy("fp").count().filter(col("count") <= cap).select("fp")
      val kept = fps.join(rare, "fp")
      kept.as("a").join(kept.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    def pairs(cap: Int): Set[(Long, Long)] =
      graft.operators.Dedup.winnowPairs(corpus, maxFpDf = cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truePairs = docs.take(5).map { case (id, _, _) => (id, id + 1000L) }.toSet
    val uncapped = pairs(10000)
    assert(uncapped === truePairs) // verify kills boilerplate-only pairs

    // cap below the boilerplate df (30+) but above the near-dup df (2):
    // ~30^2/2 boilerplate candidates vanish, every true pair survives
    assert(candidates(8) < candidates(10000) - 300)
    assert(pairs(8) === truePairs) // recall 1.0 at the cap

    // cap below the near-dup df: recall collapses to 0 — quantifies the
    // floor a caller must respect (cap must exceed expected dup-group size)
    assert(pairs(1) === Set.empty)
  }

  /** The round-9 fused in-bucket verify must equal the textbook
    * candidates→fetch-verify chain it replaced — same pairs, same jacc
    * doubles (sortedIntersectCount over sorted int sets ≡
    * size(array_intersect) over the long shingle sets, both exact on
    * the same distinct values). Corpus reuses the boilerplate+near-dup
    * shape so both the df cap and multi-shared-fp pairs are exercised. */
  test("fused in-bucket verify ≡ candidates→fetch verify (pairs and jacc bit-equal)") {
    val rnd = new scala.util.Random(23L)
    val footer = "licensed under the apache license version two point zero"
    val docs = (0 until 40).map { i =>
      val body = (0 until 20).map(_ => f"w${rnd.nextInt(300)}%03d").mkString(" ")
      (i.toLong, s"$body $footer", "src")
    }
    val nearDups = docs.take(8).map { case (id, text, s) =>
      (id + 1000L, text.substring(text.indexOf(' ') + 1), s)
    }
    val corpus = spark.createDataFrame(docs ++ nearDups)
      .toDF("doc_id", "text", "source")

    def reference(cap: Int): Set[(Long, Long, Double)] = {
      val fps = corpus.select(col("doc_id"),
        explode(array_distinct(TextHash.winnowHashes(col("text"), 4))).as("fp"))
      val rare = fps.groupBy("fp").count().filter(col("count") <= cap).select("fp")
      val kept = fps.join(rare, "fp")
      val cand = kept.as("a").join(kept.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      val sets = corpus.select(col("doc_id"),
        array_distinct(TextHash.shingleHashes(col("text"))).as("set"))
      val inter = size(array_intersect(col("set_a"), col("set_b")))
      val uni = size(col("set_a")) + size(col("set_b")) - inter
      cand
        .join(sets.select(col("doc_id").as("id_a"), col("set").as("set_a")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"), col("set").as("set_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          (inter.cast("double") / uni.cast("double")).as("jacc"))
        .filter(col("jacc") >= 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    def fused(cap: Int): Set[(Long, Long, Double)] =
      graft.operators.Dedup.winnowPairs(corpus, maxFpDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    for (cap <- Seq(4, 16, 10000)) {
      val (f, r) = (fused(cap), reference(cap))
      assert(f === r, s"cap=$cap: fused ${f.size} pairs vs reference ${r.size}")
      assert(f.nonEmpty || cap == 4) // the shape actually exercises the verify
    }
  }
}
