package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Text-analysis operators for training-data curation: token statistics,
  * quality scoring, n-gram language identification, and document
  * fingerprinting. All narrow (per-row) — zero shuffle at any scale — and
  * all deterministic arithmetic so the DuckDB oracle can hash-check them.
  */
object TextAnalysis {

  /** Profile word sets for the marker-based language-ID heuristic (the
    * n-gram-profile method of Cavnar–Trenkle reduced to word unigrams;
    * profiles tuned to the synthetic corpus vocabulary). */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("table", "row", "column", "key", "the"),
    "de" -> Seq("stream", "batch", "window", "join", "merge"),
    "fr" -> Seq("query", "filter", "sort", "agg", "scan"))

  private def toks(c: Column): Column = TextHash.tokens(c)

  /** (doc_id, n_tokens, n_distinct, ttr) — type-token ratio per doc. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks(col("text"))).as("n_tokens"),
      size(array_distinct(toks(col("text")))).as("n_distinct"),
      (size(array_distinct(toks(col("text")))).cast("double")
        / size(toks(col("text"))).cast("double")).as("ttr"))

  /** Quality score: blend of type-token ratio, non-stopword mass, and a
    * length prior. Single-spaced corpus ⇒ avg token length is derivable
    * from char count. Composite stays in one fixed double-op order. */
  def qualityScore(docs: DataFrame, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val t = toks(col("text"))
    val n = size(t).cast("double")
    val nStop = size(filter(t, w => w.isInCollection(stopwords))).cast("double")
    val ttr = size(array_distinct(t)).cast("double") / n
    val stopRatio = nStop / n
    val lenPrior = least(n / lit(100.0), lit(1.0))
    docs.select(col("doc_id"),
      size(t).as("n_tokens"),
      stopRatio.as("stop_ratio"),
      (ttr * 0.5 + (lit(1.0) - stopRatio) * 0.3 + lenPrior * 0.2).as("quality"))
  }

  /** Marker-profile language ID: score = marker hits per profile, predict
    * the first profile achieving the max (first-wins ties, same CASE
    * cascade shape as the k-means assignment). */
  def langId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val scores = profiles.map { case (lang, words) =>
      size(filter(t, w => w.isInCollection(words))).as(s"s_$lang")
    }
    val cols = profiles.map { case (lang, _) => col(s"s_$lang") }
    val pred = profiles.init.zipWithIndex.foldRight(lit(profiles.last._1)) {
      case (((lang, _), i), els) =>
        val beats = cols.drop(i + 1).map(c => cols(i) >= c).reduce(_ && _)
        when(beats, lang).otherwise(els)
    }
    docs.select(col("doc_id") +: scores: _*)
      .withColumn("pred_lang", pred)
  }

  /** Language-ID eval: confusion matrix of [[langId]]'s prediction
    * against the corpus's labeled `lang` column, plus per-true-language
    * recall — the accuracy readout that decides whether the cheap
    * n-gram heuristic suffices for a source or a model upgrade is due
    * (the same eval-harness shape as the ANN and dedup-family evals).
    * Truth totals re-aggregate the COLLAPSED confusion cells, never a
    * second corpus scan; the fraction is one double division per cell.
    * Output: (lang, pred_lang, n, n_true, frac). */
  def langIdEval(docs: DataFrame): DataFrame = {
    val cells = langId(docs).select(col("doc_id"), col("pred_lang"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
    val truth = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
    cells.join(broadcast(truth), "lang")
      .select(col("lang"), col("pred_lang"), col("n"), col("n_true"),
        (col("n").cast("double") / col("n_true").cast("double")).as("frac"))
  }

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single other non-space chars — the pre-tokenization shape BPE vocabs
    * apply before merges, enough for the token-budget accounting a
    * training pipeline does. Narrow regexp_count, zero shuffle. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(TextHash.tokens(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("bpe_tokens"))

  /** Deterministic train/validation/test split by content hash: bucket =
    * mix(polyHash(text)) mod 100 → train < 90, valid < 95, else test.
    * Content hashing (not doc_id) keeps exact duplicates in the same
    * split — the standard leakage guard. The quadratic mix
    * ([[Curation.gateHash]]) is load-bearing: raw polynomial hashes of
    * templated texts differing by a counter are consecutive (or
    * fixed-stride) integers, and a stride that divides 100 would send
    * an entire template family to ONE split. Pure projection, zero
    * shuffle, replayable. */
  def hashSplit(docs: DataFrame): DataFrame = {
    val bucket = Curation.gateHash(TextHash.polyHash(col("text")), 100L)
    docs.select(col("doc_id"), bucket.cast("int").as("bucket"),
      when(bucket < 90, "train").when(bucket < 95, "valid")
        .otherwise("test").as("split"))
  }

  /** Token-budget accounting: whitespace + BPE-ish token totals per
    * source — the numbers a mixture-weighting step consumes. */
  def tokenBudget(docs: DataFrame): DataFrame =
    tokenCounts(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens").cast("long")).as("ws_total"),
        sum(col("bpe_tokens").cast("long")).as("bpe_total"))

  /** Document fingerprints: rolling polynomial hash (locality-free content
    * id in bigint space) + md5 (collision-safe content id). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TextHash.polyHash(col("text")).as("poly_fp"),
      md5(col("text")).as("md5_fp"))

  /** Repetition ratio — the Gopher/C4-family quality rule: fraction of
    * word bigrams that are repeats of an earlier bigram in the same doc
    * (1 − distinct/total). High values flag boilerplate/spam for
    * filtering. The word-hash array materializes as a COLUMN first, then
    * bigrams index into it with element_at — composing the hash inside
    * the lambda would re-evaluate the whole subtree per element
    * (interpreted + quadratic). `sequence(1, 0)` DESCENDS in Spark, so
    * the < 2-token case is guarded explicitly. Narrow, zero shuffle. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    import TextHash.P
    val whs = col("whs")
    val bigrams = when(size(whs) >= 2,
      transform(sequence(lit(1), size(whs) - 1),
        i => (element_at(whs, i) * 131 + element_at(whs, i + 1)) % P))
      .otherwise(array().cast("array<bigint>"))
    docs.select(col("doc_id"), TextHash.wordHashes(col("text")).as("whs"))
      .select(col("doc_id"), bigrams.as("bgs"))
      .select(col("doc_id"),
        size(col("bgs")).as("n_bigrams"),
        size(array_distinct(col("bgs"))).as("n_distinct"),
        when(size(col("bgs")) > 0,
          lit(1.0) - size(array_distinct(col("bgs"))).cast("double")
            / size(col("bgs")).cast("double"))
          .otherwise(0.0).as("rep_ratio"))
  }

  /** EXACT corpus heavy hitters with a bounded-memory candidate pass:
    * tokens with frequency > n/k, found by (1) a Misra–Gries sketch
    * aggregate (custom `TypedImperativeAggregate`, ≤ k-1 counters per
    * buffer, mergeable — `graftnative.MisraGriesAgg`) whose output is a
    * guaranteed SUPERSET of the true heavy hitters, then (2) an exact
    * re-count of just the candidates (broadcast semi-join) filtered with
    * integer arithmetic `cnt·k > n`. The full-vocabulary groupBy a naive
    * plan needs never happens — at 100 TB the sketch pass is map-side
    * constant memory and the re-count touches ≤ k-1 keys. Final output
    * is exact, so the oracle checks it against DuckDB's true frequency
    * filter. Output: (wh, cnt) for each heavy-hitter token hash.
    *
    * The corpus total rides the SKETCH aggregate (one agg producing
    * (candidates, total)), so the whole operator is exactly two scans of
    * the exploded tokens: sketch+total, then the candidate re-count — a
    * separate count() pass would re-read the corpus a third time for a
    * number the first pass already saw. */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.SketchAggregates
    val toks = docs.select(explode(TextHash.wordHashes(col("text"))).as("wh"))
    val cands = toks.agg(SketchAggregates.misraGries(col("wh"), k).as("cand"),
        count(lit(1)).as("total"))
      .select(explode(col("cand")).as("wh"), col("total"))
    // `total` is a single repeated value riding the broadcast candidate
    // rows; grouping by it is free and replaces the old scalar crossJoin
    toks.join(broadcast(cands), "wh")
      .groupBy(col("wh"), col("total")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > col("total"))
      .select(col("wh"), col("cnt"))
  }

  /** TF-IDF top terms per doc, with a RATIONAL idf — `(tf/len)·(N/df)`
    * instead of the textbook `log(N/df)` — because `log` is a libm call
    * whose last-ulp rounding differs across engines and the ranking is
    * unchanged by the monotone transform. Shuffle profile: one groupBy
    * on (doc, term) for tf, one on term for df (both map-side partial),
    * one equi-join on term (no broadcast — the vocabulary grows with the
    * corpus), one per-doc window for the top-k. Every step is linear and
    * key-partitioned at any corpus size. */
  def tfIdfTopTerms(docs: DataFrame, topK: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextHash.wordHashes(col("text"))).as("wh"))
    val tf = toks.groupBy(col("doc_id"), col("wh")).agg(count(lit(1)).as("tf"))
    val docLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val df = tf.groupBy(col("wh")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(docLen, "doc_id").join(df, "wh").crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf").cast("double") / col("len").cast("double")) *
          (col("n_docs").cast("double") / col("df").cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("wh"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("wh"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** BM25 document ranking (Robertson–Spärck Jones) for a FIXED query
    * term set, with the idf in its RATIONAL form
    * `(N − df + 0.5)/(df + 0.5)` — the textbook `ln(·)` is a monotone
    * libm call whose last-ulp rounding differs across engines and does
    * not change the ranking. Per-term scores are pure row-wise double
    * arithmetic in one fixed operation order; the per-doc Σ over query
    * terms is pivoted into per-term columns and added LEFT-TO-RIGHT, so
    * the result is bit-identical regardless of aggregation order (each
    * pivot cell sums at most one value).
    *
    * Shuffle profile: tokens filtered to the query terms BEFORE the
    * (doc, term) tf groupBy (the scan reduces to query-term hits), df
    * is |terms| rows (broadcast), doc lengths shuffle on doc_id, the
    * corpus-wide (N, Σlen) scalar rides a one-row broadcast, and the
    * final top-k is a distributed TakeOrdered — no global window over
    * the corpus. */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String], topK: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, s"1..16 terms, got ${terms.size}")
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.TextHash.tokens(col("text"))).as("tok"))
    val docLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val stats = docLen.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("tot_len"))
    val tf = toks.filter(col("tok").isInCollection(terms))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val avgdl = col("tot_len").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val denom = col("tf").cast("double") +
      (lit(1.2) * (lit(0.25) + (lit(0.75) * (col("len").cast("double") / avgdl))))
    val scored = tf.join(docLen, "doc_id").join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("s", idf * ((col("tf").cast("double") * lit(2.2)) / denom))
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("tok") === t, col("s"))).as(s"s_$i")
    }
    val grouped = scored.groupBy(col("doc_id")).agg(pivots.head, pivots.tail: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val top = grouped.select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w))
  }

  /** Linear text-classifier INFERENCE (the fastText / logistic-over-
    * hashed-features shape every model-based quality filter runs at
    * corpus scale): score = mean over tokens of weight(hash(token)),
    * keep = score > 0. The weight table here is a deterministic seeded
    * function of the hash — it stands in for trained weights, which are
    * not learnable in this environment — but the PLUMBING is the real
    * thing: hashed features (no vocabulary join), a LEFT-TO-RIGHT
    * sequential fold (deterministic doubles — the same `aggregate` HOF
    * contract as the vector ops), length normalization, map-only at any
    * scale. Swapping real weights in means replacing one expression. */
  def linearScore(docs: DataFrame): DataFrame = {
    import graft.functions.TextHash
    val whs = TextHash.wordHashes(col("text"))
    docs.select(col("doc_id"), whs.as("whs"))
      .filter(size(col("whs")) > 0)
      .withColumn("score",
        aggregate(col("whs"), lit(0.0), (acc, wh) =>
          acc + ((wh * 2654435761L) % TextHash.P % 2001L - 1000L).cast("double") / 1000.0)
          / size(col("whs")).cast("double"))
      .select(col("doc_id"), col("score"), (col("score") > 0.0).as("keep"))
  }

  /** Inverted index build: term → (document frequency, content hash of
    * the doc_id-sorted posting list) — the search-index construction
    * pass, emitted as a verifiable digest rather than the raw lists.
    * One distinct + one groupBy, both shuffling on the term (vocabulary
    * cardinality); posting lists sort per-term AFTER the shuffle, so no
    * global sort. A term whose posting list outgrows executor memory is
    * the classic stopword — production shards those by (term, bucket);
    * the digest form keeps this operator's output bounded either way. */
  def invertedIndex(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.TextHash.tokens(col("text"))).as("term"))
      .distinct()
    toks.groupBy(col("term")).agg(
      count(lit(1)).as("df"),
      md5(concat_ws(",",
        transform(sort_array(collect_list(col("doc_id"))), _.cast("string"))))
        .as("postings_md5"))
  }

  /** Token co-occurrence counts with a rational association score — the
    * word2vec/GloVe-style counting pass. A forward window of `maxDist`
    * positions is materialized per row with array slices (zip token i
    * with tokens i+1..i+maxDist) — map-only, NO positional self-join
    * (which would be O(len²) per doc before filtering). Association =
    * (c_ab · T) / (c_a · c_b), the PMI argument without the monotone
    * log (libm-free, cross-engine exact). Unigram joins shuffle on the
    * term; the one-row total rides the |vocab|-bounded pair table. */
  def cooccurrence(docs: DataFrame, maxDist: Int = 2, minCount: Long = 1L): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, s"maxDist in 1..8, got $maxDist")
    val tk = graft.functions.TextHash.tokens(col("text"))
    val pairSlices = (1 to maxDist).map { d =>
      val len = greatest(lit(0), size(col("tk")) - d)
      zip_with(slice(col("tk"), lit(1), len), slice(col("tk"), lit(d + 1), len),
        (x, y) => struct(x.as("a"), y.as("b")))
    }
    val pairs = docs.select(tk.as("tk"))
      .filter(size(col("tk")) > 1)
      .select(explode(flatten(array(pairSlices: _*))).as("p"))
      .select(col("p.a"), col("p.b"))
    val cab = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val toks = docs.select(explode(tk).as("t"))
    val uni = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("t_total"))
    cab
      .join(uni.select(col("t").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("t").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("c_ab"),
        ((col("c_ab").cast("double") * col("t_total").cast("double"))
          / (col("c_a").cast("double") * col("c_b").cast("double"))).as("assoc"))
  }

  /** Count-Min sketch (Cormode–Muthukrishnan) built DECLARATIVELY: the
    * counter matrix is a groupBy over (row, cell) — Spark's map-side
    * partials ARE the sketch merge, no custom aggregate needed — and a
    * point estimate is the min over rows of the queried cell. Hashes
    * are seeded affine maps (exact integer arithmetic), so unlike
    * library sketches the WHOLE construction replays in SQL and the
    * estimates are oracle-gated, including the one-sided error
    * (estimate ≥ exact, equality when a cell has no collisions).
    * Output per distinct token: (wh, est, exact). Shuffles: tokens ×
    * `rows` to (row, cell) — bounded `rows·width` counters however
    * large the corpus — plus the exact-count groupBy for the gate. */
  /** The seeded affine cell map shared by the batch sketch, the probe
    * side, and the streaming fold — exact integer arithmetic, so every
    * consumer (including the DuckDB oracle) lands in the same cell. */
  private def cmCell(wh: Column, r: Column, width: Int): Column =
    ((wh * (lit(1000003L) + r * 2L) + r) % graft.functions.TextHash.P) % width

  /** Just the Count-Min COUNTER MATRIX of a corpus as a (r, c, cnt)
    * frame — bounded at rows·width cells however large the input, and
    * ADDITIVE: matrices of two corpora merge by cell-wise sum (groupBy
    * IS the merge), which is what makes the sketch shard-parallel at
    * 100 TB and streaming-foldable ([[graft.streaming.StreamOps.streamingCountMinFold]]). */
  def countMinCounters(docs: DataFrame, rows: Int = 4, width: Int = 256): DataFrame = {
    import graft.functions.TextHash
    require(rows >= 1 && rows <= 16 && width >= 2, s"bad sketch dims $rows x $width")
    val toks = docs.select(explode(TextHash.wordHashes(col("text"))).as("wh"))
    toks.select(col("wh"), explode(
        array((0 until rows).map(r => lit(r.toLong)): _*)).as("r"))
      .select(col("r"), cmCell(col("wh"), col("r"), width).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  def countMinEstimates(docs: DataFrame, rows: Int = 4, width: Int = 256): DataFrame = {
    import graft.functions.TextHash
    require(rows >= 1 && rows <= 16 && width >= 2, s"bad sketch dims $rows x $width")
    def cell(wh: Column, r: Column): Column = cmCell(wh, r, width)
    val toks = docs.select(explode(TextHash.wordHashes(col("text"))).as("wh"))
    val counters = countMinCounters(docs, rows, width)
    val exact = toks.groupBy(col("wh")).agg(count(lit(1)).as("exact"))
    val probes = exact.select(col("wh"), col("exact"), explode(
        array((0 until rows).map(r => lit(r.toLong)): _*)).as("r"))
      .select(col("wh"), col("exact"), col("r"), cell(col("wh"), col("r")).as("c"))
    probes.join(counters, Seq("r", "c"))
      .groupBy(col("wh"), col("exact")).agg(min(col("cnt")).as("est"))
      .select(col("wh"), col("est"), col("exact"))
  }

  /** Per-GROUP heavy hitters: [[heavyHitters]] with the Misra–Gries
    * sketch keyed by a group column — one sketch of bounded size per
    * group, map-side partials merged per group, so the shuffle carries
    * ≤ (k−1) counters per (partition, group) however large the corpus.
    * The exact re-count joins tokens back on (group, token): candidates
    * are NOT broadcast here because the candidate set grows with the
    * group count — the equi-join shuffles on the compound key instead,
    * which is the shape that survives millions of groups. Output is
    * EXACT (the sketch only shortlists; the re-count and the `cnt·k >
    * total` threshold decide), so the oracle gate covers it. */
  def groupHeavyHitters(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.SketchAggregates
    val toks = docs.select(col(groupCol),
      explode(TextHash.wordHashes(col("text"))).as("wh"))
    val cands = toks.groupBy(col(groupCol))
      .agg(SketchAggregates.misraGries(col("wh"), k).as("cand"),
        count(lit(1)).as("total"))
      .select(col(groupCol), explode(col("cand")).as("wh"), col("total"))
    toks.join(cands, Seq(groupCol, "wh"))
      .groupBy(col(groupCol), col("wh"), col("total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > col("total"))
      .select(col(groupCol), col("wh"), col("cnt"))
  }

  /** Deterministic stratified sample: the first `perStratum` docs of each
    * stratum in content-hash order (ties to doc_id) — replayable
    * class-balanced subsets for eval sets / ablations. One shuffle on the
    * stratum key; rank window never materializes beyond each partition. */
  def stratifiedSample(docs: DataFrame, stratumCol: String, perStratum: Int): DataFrame = {
    // mixed-hash order, not raw: raw polynomial hashes of templated
    // texts are counter-ordered, which would make "first k by hash"
    // mean "oldest k" (see Curation.gateHash)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(Curation.gateHash(TextHash.polyHash(col("text")), TextHash.P),
        col("doc_id"))
    docs.select(col("doc_id"), col(stratumCol), col("text"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum)
      .select(col("doc_id"), col(stratumCol), col("rn"))
  }

  /** [[stratifiedSample]] re-expressed as a BOUNDED AGGREGATE: per
    * stratum, bottom-`perStratum` docs by (gate-hash ASC, doc_id ASC)
    * via the native top-k aggregate on the negated hash
    * ([[org.apache.spark.sql.graftnative.TopKAgg]]). Same rows, same
    * ranks, same oracle as the window form.
    *
    * Scale relationship, measured (SketchSpec bounded-shuffle gate):
    * Catalyst's WindowGroupLimit pushdown already k-bounds the WINDOW
    * form's shuffle for `rank() <= k` filters (each map partition
    * pre-filters to local top-k before the exchange), so shuffle bytes
    * are comparable between the two; a naive window (pushdown
    * disabled) ships the whole table. The aggregate form's remaining
    * edge is CPU shape — a k-entry heap per (partition, stratum)
    * instead of a full local SORT of every partition's rows — and
    * applicability where the pattern is not a rank filter (inside
    * rollups, mixed aggregations, streaming folds). Output:
    * (doc_id, stratum, rn), rn 1-based in hash order. */
  def stratifiedSampleAgg(docs: DataFrame, stratumCol: String, perStratum: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.SketchAggregates
    val h = Curation.gateHash(TextHash.polyHash(col("text")), TextHash.P)
    docs.select(col(stratumCol), (-h).as("v"), col("doc_id"))
      .groupBy(col(stratumCol))
      .agg(SketchAggregates.topK(col("v"), col("doc_id"), perStratum).as("top"))
      .select(col(stratumCol), posexplode(col("top")))
      .select(col("col.id").as("doc_id"), col(stratumCol),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Corpus-trained unigram-LM quality score — the CCNet/KenLM
    * perplexity-filter shape: train token frequencies on the corpus
    * itself, score each doc by its mean token probability. The textbook
    * statistic is mean log-prob; `log` is a libm call whose last-ulp
    * rounding differs across engines, so the score here is the mean
    * SCALED probability `Σ c·⌊cnt·scale/N⌋ div n_tokens` — all-integer,
    * bit-identical in both engines, and ordering docs by common-token
    * mass exactly as the filter needs (rare-token/garbage docs score
    * low, natural-vocabulary docs high).
    *
    * Shuffle profile at corpus scale: the (doc, token) tf groupBy and
    * the vocabulary count groupBy are both map-side partial; the
    * token-probability join has ONE build row per vocabulary key, so
    * stopword-grade hot tokens mean a busy partition, never a quadratic
    * blowup (AQE skew split handles the residue); the corpus-total
    * scalar rides a one-row broadcast. `scale` bounds intermediate
    * magnitude: cnt·scale must fit int64, so 1e6 leaves headroom up to
    * ~9·10^12 corpus tokens — raise N, lower scale at the extreme. */
  def lmQualityScore(docs: DataFrame, scale: Long = 1000000L): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextHash.wordHashes(col("text"))).as("wh"))
    val per = toks.groupBy(col("doc_id"), col("wh")).agg(count(lit(1)).as("c"))
    val vocab = toks.groupBy(col("wh")).agg(count(lit(1)).as("cnt"))
    val tot = toks.agg(count(lit(1)).as("n"))
    val probs = vocab.crossJoin(broadcast(tot))
      .select(col("wh"), expr(s"(cnt * ${scale}L) div n").as("p_scaled"))
    per.join(probs, "wh")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("p_scaled")).as("s"), sum(col("c")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("s div n_tokens").as("lm_score"))
  }

  /** Hashed n-gram importance weighting — the DSIR shape (Xie et al.
    * 2023, arXiv:2302.03169): score every raw doc by how much its hashed
    * feature mass looks like a TARGET domain relative to the raw corpus.
    * Features are word hashes folded into `buckets` cells; the bucket
    * ratio r_b = ⌊(tcnt_b+1)·scale / (rcnt_b+1)⌋ is the add-one-smoothed
    * target/raw frequency ratio in integer arithmetic (the log-ratio of
    * the paper is a monotone transform per bucket; summing scaled ratios
    * keeps cross-engine bit-equality and the same "looks like target"
    * ordering). Weight = per-doc mean bucket ratio.
    *
    * Scale shape: the feature histogram is BOUNDED (`buckets` rows), so
    * the ratio table broadcasts however large the corpus — the per-doc
    * pass is one map-side-partial groupBy on (doc, bucket) plus a
    * broadcast join, no corpus-side wide shuffle at all beyond the
    * doc-keyed re-aggregation. */
  def importanceWeights(docs: DataFrame, targetSource: String,
      buckets: Int = 256, scale: Long = 1000000L): DataFrame = {
    val feat = docs.select(col("doc_id"), col("source"),
        explode(TextHash.wordHashes(col("text"))).as("wh"))
      .select(col("doc_id"), col("source"),
        pmod(col("wh"), lit(buckets.toLong)).as("b"))
    val raw = feat.groupBy(col("b")).agg(count(lit(1)).as("rcnt"))
    val tgt = feat.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("tcnt"))
    val ratio = raw.join(tgt, Seq("b"), "left")
      .select(col("b"),
        expr(s"((coalesce(tcnt, 0L) + 1L) * ${scale}L) div (rcnt + 1L)").as("r"))
    feat.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("r")).as("s"), sum(col("c")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("s div n_tokens").as("weight"))
  }

  /** BPE merge LEARNING (Sennrich et al. 2016, arXiv:1508.07909) — the
    * tokenizer-training primitive itself, not just the pre-tokenization
    * counting of [[tokenCounts]]. The classic reduction makes it
    * tractable at corpus scale: one corpus scan builds the word-FREQUENCY
    * dict (vocab-sized, ≪ corpus — this is how real BPE trainers run),
    * then every merge round runs over the dict alone: weighted adjacent
    * symbol-pair counts (map-side partial groupBy), a deterministic
    * argmax ((count desc, pair asc) — a 1-row collect, the same driver-
    * loop shape as the Lloyd/medoid iterations), and a literal
    * non-overlapping left-to-right `replace` of the winning pair in every
    * word's symbol string (greedy BPE apply; `replace` is literal in both
    * engines, so no token escaping issues). Output = the learned merge
    * table (round, pair, merged symbol, support), which IS the tokenizer
    * artifact. Real trainers run tens of thousands of rounds where this
    * demonstrates the per-round dataflow; rounds are inherently
    * sequential (each argmax depends on the previous apply), so depth —
    * not the corpus — is the only driver-side loop. */
  def learnBpeMerges(docs: DataFrame, nMerges: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf0 = docs.select(explode(TextHash.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("rep", concat_ws(" ", split(col("w"), "")))
      .localCheckpoint(false) // dict reused every round; never rescan the corpus
    var wf = wf0
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to nMerges) {
      val pairs = wf.select(col("freq"), split(col("rep"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS pa, syms[i] AS pb))")).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("pa"), col("pb")).limit(1).collect()
      if (best.nonEmpty) {
        val (pa, pb, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, pa, pb, pa + pb, cnt))
        wf = wf.withColumn("rep", trim(functions_replace(
          concat(lit(" "), col("rep"), lit(" ")),
          lit(s" $pa $pb "), lit(s" $pa$pb "))))
      }
    }
    merges.result().toDF("round", "pa", "pb", "merged", "cnt")
  }

  // `replace` collides with scala.Predef-adjacent names when imported via
  // functions._ wildcards in some scopes; bind it explicitly
  private def functions_replace(src: Column, search: Column, repl: Column): Column =
    org.apache.spark.sql.functions.replace(src, search, repl)

  /** BPE ENCODE — the tokenizer-INFERENCE pass: apply the
    * [[learnBpeMerges]] merge table to every document and report
    * per-doc symbol counts (n_words, n_bpe_tokens, fertility =
    * symbols/word — the number tokenizer rollouts are judged by).
    *
    * Scale shape: learning touches only the word-frequency dict; the
    * learned merges (a handful of strings) are then inlined as a literal
    * replace CHAIN inside one `transform` lambda, so the encode itself
    * is a shuffle-free, broadcast-free map that stays in whole-stage
    * codegen — the right shape for the pass that, unlike learning, runs
    * over the full 100 TB. Merges apply in learned order; `replace` is
    * literal, non-overlapping, left-to-right in both engines, which IS
    * greedy BPE application over the space-separated symbol string. */
  def bpeEncode(docs: DataFrame, nMerges: Int = 4): DataFrame = {
    val merges = learnBpeMerges(docs, nMerges).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    def q(s: String) = s.replace("'", "''")
    val base = "' ' || array_join(split(w, ''), ' ') || ' '"
    val chain = merges.foldLeft(base) { case (acc, (pa, pb)) =>
      s"replace($acc, ' ${q(pa)} ${q(pb)} ', ' ${q(pa)}${q(pb)} ')"
    }
    docs.select(col("doc_id"),
        expr(s"transform(split(text, ' '), w -> trim($chain))").as("reps"))
      .select(col("doc_id"),
        size(col("reps")).cast("long").as("n_words"),
        expr("aggregate(reps, 0L, (a, r) -> a + CAST(size(split(r, ' ')) AS BIGINT))")
          .as("n_bpe_tokens"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
  }

  /** Distribution drift between two sources as scaled TOTAL-VARIATION
    * contributions over hashed token buckets — the corpus-monitoring
    * statistic (is today's crawl the same language as yesterday's?)
    * without PSI/KL's libm logs: per bucket, |p_A − p_B| in integer-
    * scaled probabilities (`cnt·scale div total`); Σ l1_scaled / 2 is
    * the scaled TV distance. Bounded bucket table, two map-side
    * conditional sums in ONE pass — no join, no second scan. */
  def tokenDriftL1(docs: DataFrame, sourceA: String, sourceB: String,
      buckets: Int = 256, scale: Long = 1000000L): DataFrame = {
    val feat = docs.filter(col("source").isin(sourceA, sourceB))
      .select(col("source"), explode(TextHash.wordHashes(col("text"))).as("wh"))
      .select(col("source"), pmod(col("wh"), lit(buckets.toLong)).as("b"))
    val counts = feat.groupBy(col("b")).agg(
      sum(when(col("source") === sourceA, 1L).otherwise(0L)).as("oa"),
      sum(when(col("source") === sourceB, 1L).otherwise(0L)).as("ob"))
    val tot = counts.agg(sum(col("oa")).as("ta"), sum(col("ob")).as("tb"))
    counts.crossJoin(broadcast(tot))
      .select(col("b"), col("oa"), col("ob"),
        expr(s"(oa * ${scale}L) div ta").as("pa_scaled"),
        expr(s"(ob * ${scale}L) div tb").as("pb_scaled"))
      .withColumn("l1_scaled", abs(col("pa_scaled") - col("pb_scaled")))
  }

  /** Vocabulary-coverage / OOV-rate report against the top-`vocabSize`
    * corpus unigrams — the number a tokenizer or vocab rollout is judged
    * by before training starts. Vocab = top words by (count desc, hash
    * asc) — the tie at the boundary is broken deterministically so both
    * engines cut the same set. The vocab is BOUNDED by construction, so
    * it broadcasts at any corpus size; the rest is the map-side tf
    * shape plus one doc-keyed re-aggregation. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 256): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextHash.wordHashes(col("text"))).as("wh"))
    val vocab = toks.groupBy(col("wh")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("wh")).limit(vocabSize)
      .select(col("wh"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("wh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (count(lit(1)) - coalesce(sum(col("in_vocab")), lit(0L))).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** Exact phrase search over a POSITIONAL posting list — the retrieval
    * step [[invertedIndex]]'s docfreq index can't answer ("these words,
    * adjacent, in order"). Postings are (term, doc_id, pos); an m-term
    * phrase is m probes of the posting table joined on
    * (doc_id, pos = pos₀ + i) — each probe is term-selective BEFORE the
    * join, so the plan is m filtered scans equi-joined on (doc, pos),
    * never a per-doc rescan. At index scale the posting table would be
    * the persisted bucketed table; here it derives inline. Output:
    * (doc_id, n_hits) per matching doc. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"need a multi-word phrase: $phrase")
    val postings = docs.select(col("doc_id"),
      posexplode(TextHash.tokens(col("text"))).as(Seq("pos", "term")))
    val first = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        postings.filter(col("term") === w)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }.groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
  }
}
