package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
  * SimHash (bitwise near-dup), and n-gram Jaccard verification.
  *
  * Scale notes (the point of each design):
  *  - Exact dedup is one shuffle on the content hash; the canonical-id
  *    `min` is partially aggregated map-side.
  *  - MinHash/LSH never compares all pairs: candidates come from an
  *    equi-join on (band, band-key), i.e. a shuffle keyed by bucket —
  *    the classic way O(n²) similarity drops to O(candidates) at 100 TB.
  *  - SimHash packs a document into one 24-bit int; the near-dup join is
  *    again bucketed (here by `source`) + a cheap `bit_count(xor)` filter.
  *  - All hashes are deterministic polynomials (graft.functions.TextHash),
  *    so results are reproducible and oracle-checkable — no engine-private
  *    murmur seeds.
  */
object Dedup {

  import TextHash.P

  // ---- corpus builders (deterministic dup injection for testing) ----------

  /** The corpus plus an exact copy of every doc_id ≡ 0 (mod 7), copy id =
    * doc_id + 2000000: gives exact-dedup something real to find. */
  def withExactDuplicates(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), col("source"))
      .unionAll(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"), col("text"), col("source")))

  /** The corpus plus a near-copy (first token dropped) of every doc_id ≡ 0
    * (mod 10), copy id = doc_id + 1000000: high-Jaccard near-dups for the
    * MinHash/SimHash paths to find. */
  def withNearDuplicates(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), col("source"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"),
          col("source")))

  // ---- exact dedup ---------------------------------------------------------

  /** Exact dedup by content hash: groups with ≥ 2 docs, canonical = min id.
    * One shuffle on the (high-cardinality, skew-free) hash key. */
  def exactDuplicateGroups(corpus: DataFrame): DataFrame =
    corpus.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_docs") >= 2)

  // ---- shingle sets --------------------------------------------------------

  /** (doc_id, source, shs: array<bigint>) — word-trigram shingle hashes. */
  def shingled(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), col("source"),
      TextHash.shingleHashes(col("text")).as("shs"))

  /** Exploded DISTINCT shingles: (doc_id, source, s). */
  def distinctShingles(corpus: DataFrame): DataFrame =
    shingled(corpus).select(col("doc_id"), col("source"),
      explode(array_distinct(col("shs"))).as("s"))

  // ---- n-gram Jaccard ------------------------------------------------------

  /** Pairwise Jaccard over distinct-shingle sets, blocked by `source`,
    * candidates bounded by PREFIX FILTERING (the AllPairs/PPJoin family):
    * in a global canonical shingle order (ascending hash), two sets with
    * J ≥ τ must share an element within their first
    * ℓ = |S| − ⌈τ·|S|⌉ + 1 shingles — so only the exploded PREFIXES join
    * (Σ over prefix-shingle collisions, a small fraction of the full
    * Σ count(s)² blowup on low-entropy corpora), and survivors verify
    * exactly with one `array_intersect` per candidate pair. The output
    * set is IDENTICAL to the naive all-pairs formulation (which the
    * DuckDB oracle still runs at verification scale).
    * Output: (id_a, id_b, inter, uni, jacc) for jacc ≥ minJaccard. */
  def jaccardPairs(corpus: DataFrame, minJaccard: Double): DataFrame = {
    val sets = shingled(corpus).select(col("doc_id"), col("source"),
        array_sort(array_distinct(col("shs"))).as("set"))
      .withColumn("sz", size(col("set")))
      .filter(col("sz") > 0)
    val prefixLen = (col("sz") - ceil(col("sz") * minJaccard) + 1).cast("int")
    val prefixes = sets.select(col("doc_id"), col("source"),
      explode(slice(col("set"), lit(1), prefixLen)).as("s"))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.s") === col("b.s") && col("a.source") === col("b.source")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val inter = size(array_intersect(col("set_a"), col("set_b")))
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("set").as("set_a"), col("sz").as("sz_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("set").as("set_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"), inter.cast("long").as("inter"),
        (col("sz_a") + col("sz_b") - inter).cast("long").as("uni"),
        (inter.cast("double") / (col("sz_a") + col("sz_b") - inter).cast("double")).as("jacc"))
      .filter(col("jacc") >= minJaccard)
  }

  // ---- MinHash + LSH -------------------------------------------------------

  /** MinHash signatures: (doc_id, i, mh) for i ∈ [0, numHashes); mh =
    * min over shingles s of ((2i+3)·s + 7i+1) mod P. Docs with no
    * shingles are dropped (they can't near-dup by this measure). */
  def minhashSignatures(corpus: DataFrame, numHashes: Int = 16): DataFrame =
    shingled(corpus).filter(size(col("shs")) > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(numHashes - 1)), i =>
          struct(i.cast("int").as("i"),
            array_min(transform(col("shs"), s => TextHash.permute(i, s))).as("mh"))))
          .as("sig"))
      .select(col("doc_id"), col("sig.i").as("i"), col("sig.mh").as("mh"))

  /** LSH band summaries: one row per (doc, band) with order-independent
    * band key (sum, min, max of the band's minhashes) — avoids relying on
    * any engine's aggregation order. rowsPerBand=4 ⇒ bands = n/4. */
  def lshBands(sig: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sig.groupBy(col("doc_id"), (col("i") / rowsPerBand).cast("int").as("band"))
      .agg(sum(col("mh")).as("s"), min(col("mh")).as("mn"), max(col("mh")).as("mx"))

  /** Candidate pairs: docs sharing ANY full band — an equi-join on the
    * band key, NOT an all-pairs comparison. */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.s") === col("b.s")
          && col("a.mn") === col("b.mn") && col("a.mx") === col("b.mx")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

  /** Full pipeline: shingle → minhash → band → bucket-join → exact-Jaccard
    * verify. Output (id_a, id_b, jacc) with jacc ≥ minJaccard.
    *
    * Verification is candidate-only: each surviving pair fetches the two
    * docs' distinct-shingle SETS (array columns) and intersects them
    * per row (`array_intersect`) — O(candidates), never the all-pairs
    * shingle join (whose intermediate is Σ_s count(s)², explosive on
    * low-entropy corpora). Same jacc values as the join formulation. */
  def minhashLshPairs(corpus: DataFrame, numHashes: Int = 16,
      rowsPerBand: Int = 4, minJaccard: Double = 0.5): DataFrame = {
    val cand = lshCandidates(lshBands(minhashSignatures(corpus, numHashes), rowsPerBand))
    val sets = shingled(corpus).select(col("doc_id"),
      array_distinct(col("shs")).as("set"))
    val inter = size(array_intersect(col("set_a"), col("set_b")))
    val uni = size(col("set_a")) + size(col("set_b")) - inter
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("set").as("set_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("set").as("set_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / uni.cast("double")).as("jacc"))
      .filter(col("jacc") >= minJaccard)
  }

  // ---- canonicalization (connected components over near-dup pairs) --------

  /** Collapse a near-dup PAIR list into per-document canonical ids: each
    * connected component of the pair graph maps every member to the
    * component's minimum doc_id (the survivor a dedup pipeline keeps).
    *
    * Iterative min-label propagation — per round, every node adopts the
    * smallest label among itself and its neighbors; converges in
    * O(component diameter) rounds (near-dup components are tiny: dup
    * clusters, not social graphs). Each round is one join + one groupBy —
    * shuffle-bounded, no driver-side graph. The loop is driver-controlled
    * with an early stop, the same iterate-until-fixpoint shape as the
    * k-medoids driver (SURVEY §3.2).
    *
    * Output: (doc_id, canonical_id) for every doc that appears in a pair
    * (docs with no near-dups keep themselves implicitly). */
  def canonicalAssignments(pairs: DataFrame, maxRounds: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edge list (both directions) + self-loops as the seed labels
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = edges.select(col("src").as("id"), col("src").as("label"))
      .unionAll(edges.select(col("src").as("id"), col("dst").as("label")))
      .groupBy("id").agg(min("label").as("label"))
      .cache()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // every node adopts min(own label, neighbors' labels)
      val next = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
        .unionAll(labels)
        .groupBy("id").agg(min("label").as("label"))
        .cache()
      next.count() // materialize before comparing / unpersisting parent
      converged = next.as("n").join(labels.as("p"), "id")
        .filter(col("n.label") =!= col("p.label")).isEmpty
      labels.unpersist()
      labels = next
      round += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }

  // ---- SimHash -------------------------------------------------------------

  /** 24-bit SimHash over token hashes (with multiplicity): bit b is set
    * iff Σ_tokens (±1 by bit b of the token hash) > 0. Computed
    * relationally (explode + groupBy with 24 conditional sums) so the
    * partial aggregation is map-side — one shuffle at any scale. */
  def simhash(corpus: DataFrame, bits: Int = 24): DataFrame = {
    val exploded = corpus.select(col("doc_id"),
      explode(TextHash.wordHashes(col("text"))).as("wh"))
    val sums = (0 until bits).map(b =>
      sum(when(shiftright(col("wh"), b) % 2 === 1, 1).otherwise(-1)).as(s"b$b"))
    val packed = (0 until bits).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    exploded.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** Near-dup pairs by Hamming distance ≤ maxHamming, blocked by source. */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 6, bits: Int = 24): DataFrame = {
    val sh = simhash(corpus, bits)
      .join(corpus.select(col("doc_id"), col("source")), "doc_id")
    sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
