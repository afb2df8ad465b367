package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Training-data curation operators beyond dedup: PII redaction, sequence
  * packing, and mixture (epoch-weighted) sampling. All deterministic and
  * DuckDB-mirrorable; the per-row ops are narrow (zero shuffle) and the
  * packing window shuffles once on its partition key.
  */
object Curation {

  // ---- text normalization --------------------------------------------------

  /** Canonical text normalization — the first pass of every curation
    * pipeline (and the reason two byte-different crawls of one page can
    * dedup): lowercase, every non-alphanumeric to a space, runs of
    * spaces collapsed, ends trimmed. Pure narrow regexp work (map-only
    * at any scale); the patterns are POSIX-portable so the DuckDB
    * mirror applies the identical transform. */
  def normalizeText(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("norm",
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "),
        " +", " ")))

  /** SQL mirror of [[normalizeText]] (DuckDB needs the explicit global
    * flag; Spark's regexp_replace is always global). */
  def normalizeTextSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  // ---- sharded export manifest -----------------------------------------------

  /** Deterministic shard routing + per-shard manifest — the training-
    * file export gate: shard = first 8 hex digits of the content md5
    * (stable under re-runs and engine swaps, unlike a partition-id
    * round-robin), manifest row = (shard, doc count, digest of the
    * SORTED per-doc content hashes). Two jobs diff their manifests to
    * prove byte-level export equality without comparing payloads.
    * Shape: narrow hash work + one groupBy on the shard id. */
  def shardManifest(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val shard = expr("CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT)") % nShards
    docs.select(md5(col("text")).as("h"), shard.as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws(",", array_sort(collect_list(col("h"))))).as("content_md5"))
  }

  // ---- pseudonymization + k-anonymity ---------------------------------------

  /** Privacy release prep: replace the entity id with a deterministic
    * affine pseudonym (joinable across tables released together, not
    * reversible without the constants) and SUPPRESS the quasi-identifier
    * columns of any group smaller than k distinct entities — the
    * k-anonymity gate. Group sizes come from one aggregate on the QI
    * key; the per-row work is a broadcast join (|QI groups| rows) plus
    * integer arithmetic, map-shaped at any scale. Suppressed rows keep
    * their measures; only the QI columns null out (standard cell
    * suppression, the row count stays honest). */
  def pseudonymizeKAnon(events: DataFrame, idCol: String,
      quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need QI columns and k >= 2")
    val pseudo = (col(idCol) * 48271L + 1234567L) % 1000000007L
    val sizes = events.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(idCol)).as("__grp_users"))
    val joined = events.join(broadcast(sizes), quasiCols)
      .withColumn("pseudo_id", pseudo)
      .withColumn("suppressed", col("__grp_users") < k)
    // the direct identifier is dropped; QI columns null out when
    // suppressed; measures and other columns pass through untouched
    val rest = events.columns.filterNot(c => c == idCol || quasiCols.contains(c))
    joined.select(col("pseudo_id") +:
      quasiCols.map(c => when(!col("suppressed"), col(c)).as(c)) ++:
      rest.map(col) :+ col("suppressed"): _*)
  }

  /** l-diversity audit — the release gate k-anonymity alone misses:
    * a quasi-identifier group can hold ≥ k users yet give every one of
    * them the SAME sensitive value, so membership still discloses it
    * (Machanavajjhala et al. 2007). One row per QI group:
    * (quasi..., n_rows, n_users, n_sensitive, diverse) where diverse ⇔
    * the group carries ≥ l distinct sensitive values. Single groupBy
    * with two exact distinct counts (Spark expands multi-distinct
    * aggregates map-side); the group frame is tiny, the scan is one
    * pass. Pairs with [[pseudonymizeKAnon]]: suppress (or generalize)
    * the groups this audit fails before release. */
  def lDiversityAudit(events: DataFrame, idCol: String,
      quasiCols: Seq[String], sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, "need QI columns and l >= 2")
    events.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_users"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  // ---- document chunking ---------------------------------------------------

  /** Overlapping sliding-window chunking — the context-window splitter
    * every RAG index and long-document training pipeline runs: chunk k
    * covers tokens [k·stride, k·stride + chunkSize), one chunk per
    * stride step until the text is consumed (tail chunks run short,
    * they are not dropped). Pure per-row array work after the split —
    * map-only at any scale, output rows ≈ n_tokens/stride per doc.
    * Output: (doc_id, chunk_idx, chunk_tokens, chunk_md5) — the md5
    * gates the exact chunk CONTENT cross-engine without dumping it. */
  def chunkDocs(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val chunk = slice(col("tk"), col("chunk_idx") * stride + 1, lit(chunkSize))
    docs.select(col("doc_id"), TextHash.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), expr(s"(size(tk) - 1) div $stride"))))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        size(chunk).as("chunk_tokens"),
        md5(concat_ws(" ", chunk)).as("chunk_md5"))
  }

  // ---- PII redaction -------------------------------------------------------

  /** The synthetic corpus carries no PII, so the redaction queries run on
    * a corpus with DETERMINISTIC injected contacts (same pattern as
    * [[Dedup.withExactDuplicates]]): every doc_id ≡ 0 (mod 5) gains an
    * email, a phone number, and an IPv4 derived from its id. */
  def withInjectedPii(docs: DataFrame): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val contact = concat(lit(" contact user"), idStr, lit("@example.com or +1-555-"),
      (col("doc_id") % 10000).cast("string"), lit(" at 10."),
      (col("doc_id") % 256).cast("string"), lit(".0."),
      (col("doc_id") % 200).cast("string"))
    docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), contact))
        .otherwise(col("text")).as("text"),
      col("source"))
  }

  val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]+"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact emails, phone numbers, and IPv4s to typed placeholders and
    * count each category — the pre-training PII scrub. Redaction order is
    * fixed (email → phone → ip) and the three patterns are mutually
    * non-overlapping, so counting BEFORE redacting equals counting during.
    * Narrow regexp work only; at 100 TB this is a map-only stage. */
  /** The released text form of the PII scrub — same fixed-order chain
    * [[redactPii]] hashes (email → phone → ip). */
  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  def redactPii(docs: DataFrame): DataFrame = {
    val redacted = redactText(col("text"))
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
      regexp_count(col("text"), lit(IpRe)).as("n_ips"),
      md5(redacted).as("redacted_md5"))
  }

  // ---- sequence packing ----------------------------------------------------

  /** Concat-and-chunk sequence packing: docs are laid end-to-end in
    * doc_id order WITHIN each source shard and cut into `seqLen`-token
    * context windows; each doc is assigned the bin its first token lands
    * in, plus its offset inside that bin. This is the deterministic
    * streaming-pack a training pipeline uses (no bin search, single
    * window pass); partitioning by source keeps the window parallel — a
    * GLOBAL packing order would serialize on one partition at 100 TB.
    * Output: (doc_id, source, n_tokens, bin, off). */
  def sequencePack(docs: DataFrame, seqLen: Int = 1024): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"),
        size(TextHash.tokens(col("text"))).as("n_tokens"))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0)).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("start") / seqLen).cast("long").as("bin"),
        (col("start") % seqLen).cast("long").as("off"))
  }

  /** Assembly of [[sequencePack]]'s bins into training batches: one row
    * per (source, bin) with the doc ids in pack order and the bin's
    * token count — the materialization step that hands sequences to a
    * trainer. `sort_array` on (doc_id) structs makes the collected order
    * deterministic regardless of partitioning; one shuffle on the
    * (source, bin) key. */
  def packAssembly(docs: DataFrame, seqLen: Int = 1024): DataFrame =
    sequencePack(docs, seqLen)
      .groupBy(col("source"), col("bin"))
      .agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("bin_tokens"))
      .select(col("source"), col("bin"),
        concat_ws(",", col("doc_ids")).as("doc_ids"),
        col("n_docs"), col("bin_tokens"))

  // ---- quality-filter verdicts ---------------------------------------------

  /** C4/Gopher-style rule-table filtering with REASON CODES — the shape a
    * curation pipeline actually ships (keep/drop plus why, so drops are
    * auditable and rates monitorable per rule). Rules run in a fixed
    * order and the first failure names the verdict; all ratios are exact
    * integer-over-integer doubles, so the oracle agrees bit-for-bit.
    * Narrow per-row work — a map-only stage at any scale. */
  def qualityVerdicts(docs: DataFrame,
      minTokens: Int = 20, minTtr: Double = 0.35,
      maxStopRatio: Double = 0.12,
      stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val t = TextHash.tokens(col("text"))
    val n = size(t)
    val ttr = size(array_distinct(t)).cast("double") / n.cast("double")
    val stopRatio = size(filter(t, w => w.isInCollection(stopwords))).cast("double") /
      n.cast("double")
    val reason = when(n < minTokens, "too_short")
      .when(ttr < minTtr, "low_ttr")
      .when(stopRatio > maxStopRatio, "high_stop")
      .otherwise("ok")
    docs.select(col("doc_id"), n.as("n_tokens"),
      ttr.as("ttr"), stopRatio.as("stop_ratio"),
      reason.as("reason"), (reason === "ok").as("keep"))
  }

  // ---- mixture sampling ----------------------------------------------------

  /** Epoch-weighted mixture sampling: each source's docs are repeated
    * `weight` times in expectation — floor(weight) guaranteed copies plus
    * one more iff the doc's content-hash bucket (polyHash mod 1000)
    * falls under the fractional part. Deterministic, replayable, and
    * content-keyed (exact dups up/downsample identically). Explode is the
    * only row expansion; no shuffle at all. Output: (doc_id, source,
    * copy ∈ [1, n_copies]).
    *
    * The fractional threshold is FLOOR((w − ⌊w⌋)·1000) on both engines —
    * floor, not round or a bare integer cast, because the two must agree
    * on every IEEE double: Spark's long cast truncates while e.g.
    * DuckDB's BIGINT cast rounds, so weight 0.3 (whose fractional product
    * is 299.999…97) would diverge 299 vs 300 cross-engine. Floor of the
    * same double is engine-independent and has no .5 tie cases. The cost
    * is a ≤ 1/1000 downward bias on weights whose fractional part isn't
    * exactly representable (0.3 samples at 299/1000). */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double]): DataFrame = {
    val weight = weights.foldLeft(lit(1.0)) { case (els, (src, w)) =>
      when(col("source") === src, lit(w)).otherwise(els)
    }
    val base = floor(weight).cast("int")
    // cast("long") truncates toward zero == floor for this non-negative
    // product; floor() spelled explicitly so the contract is visible
    val frac = floor((weight - floor(weight)) * 1000).cast("long")
    // mixed gate, not the raw residue: polynomial hashes of near-
    // identical texts are near-consecutive integers (see
    // [[sqrtTemperatureSample]]), so the raw mod-1000 would admit
    // all-or-none of a sequentially-numbered run
    val extra = (gateHash(TextHash.polyHash(col("text")), 1000L) < frac).cast("int")
    val n = base + extra
    // sequence(1, 0) DESCENDS in Spark — only build it when n >= 1, and
    // let the non-outer explode drop zero-copy docs
    docs.select(col("doc_id"), col("source"),
        explode(when(n >= 1, sequence(lit(1), n))
          .otherwise(array().cast("array<int>"))).as("copy"))
  }

  /** Curriculum ordering: a GLOBAL total-order rank over the whole
    * corpus (e.g. easy→hard by quality score) computed the way that
    * survives 100 TB. A single-partition `row_number() OVER (ORDER BY …)`
    * funnels the corpus through one task; instead this range-partitions
    * on the sort key (Spark samples boundaries), sorts within each range,
    * and assigns indices with `zipWithIndex` — one lightweight per-
    * partition count job plus one pass, no global funnel. The sort must
    * be TOTAL (callers append a tiebreak id) so the rank is deterministic
    * and replayable. The one justified RDD hop in this codebase outside
    * codec kernels: Dataset has no distributed rank-assignment
    * primitive. */
  def curriculumRank(df: DataFrame, sortCols: Seq[Column],
      numRanges: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val sorted = df.repartitionByRange(numRanges, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(StructField("rank", LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex()
      .map { case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(ranked, schema)
  }

  /** Deterministic per-epoch training-order shuffle: every epoch
    * re-permutes the corpus by an affine map of doc_id mod prime P whose
    * MULTIPLIER is epoch-derived — replayable from nothing but the epoch
    * number, no stored permutation (what a data loader actually needs
    * from "shuffle each epoch"). The multiplier must carry the epoch: an
    * additive-only epoch term shifts every key by the same constant mod
    * P, which is a cyclic ROTATION of the previous epoch's order, not a
    * new permutation (caught by the spec's epoch-1-vs-2 assertion).
    * m = (2654435761·(epoch+1)) mod (P−3) + 2 is never ≡ 0 mod P and
    * pseudorandomly large; key = (doc_id mod P)·m + epoch, mod P — all
    * exact int64 (max ~2^60). The global contiguous rank is assigned by
    * [[curriculumRank]]'s range-partition + zipWithIndex path, never a
    * one-task global window; ties (doc_ids ≡ mod P) break by doc_id, so
    * the order is total. */
  def epochShuffle(docs: DataFrame, epoch: Int, numRanges: Int = 32): DataFrame = {
    val m = 2654435761L * (epoch + 1L) % (TextHash.P - 3) + 2
    val key = ((col("doc_id") % TextHash.P) * lit(m) + lit(epoch.toLong)) % TextHash.P
    curriculumRank(docs.select(col("doc_id"), key.as("shuffle_key")),
      Seq(col("shuffle_key"), col("doc_id")), numRanges)
  }

  /** Greedy per-source token-budget fill: docs are admitted in
    * content-hash order (replayable, unbiased by id assignment) until
    * each source's running token total would exceed `budget` — how a
    * mixture target ("≤ N tokens of web, ≤ M of code") is actually cut
    * from an over-sized corpus. One shuffle on the source key; the
    * cumulative window never materializes beyond each source
    * partition. Skew note: sources are few and large at corpus scale,
    * so the window key is the mixture's natural parallelism — pipelines
    * needing finer grain pre-shard sources (the same (source, shard)
    * trick sequencePack documents). */
  /** Dataset card: the per-source summary a curated corpus release
    * publishes — doc/token/char volume, exact-duplicate count, and the
    * language mix (count + majority language, ties broken
    * alphabetically so the card is replayable). Two corpus scans, both
    * column-pruned to what they aggregate: (1) `(source, md5(text),
    * tokens, chars)` with ONE mixed distinct aggregate (Spark plans it
    * as a ×2 Expand of 3 narrow columns — single pass, no third scan
    * for the distinct); (2) `(source, lang)` counts, reused for both
    * `n_langs` and the majority pick, with the per-source window
    * running over ≤|langs| collapsed rows, never documents. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"),
      sum(size(TextHash.tokens(col("text"))).cast("long")).as("total_tokens"),
      sum(col("n_chars")).as("total_chars"))
    val lc = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("lang"))
    val langs = lc
      .withColumn("rn", row_number().over(w))
      .groupBy("source").agg(
        count(lit(1)).as("n_langs"),
        max(when(col("rn") === 1, col("lang"))).as("top_lang"),
        max(when(col("rn") === 1, col("c"))).as("top_lang_docs"))
    base.join(langs, "source")
  }

  def budgetFill(docs: DataFrame, budget: Long): DataFrame = {
    // mixed-hash admission order (raw hashes of templated texts are
    // counter-ordered — the budget would always go to the oldest docs)
    val w = Window.partitionBy(col("source"))
      .orderBy(gateHash(TextHash.polyHash(col("text")), TextHash.P), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"),
        col("text"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** Temperature-scaled source rebalancing (the multilingual-corpus
    * sampling rule, α = 0.5): per-source keep rate
    * √(n_min / n_source) — big sources downsample toward the square
    * root of their size, the smallest keeps everything. α is FIXED at
    * 0.5 because √ is the one power both engines compute identically
    * (IEEE-correctly-rounded sqrt after one double division); arbitrary
    * n^α needs libm pow, which is not cross-engine exact. The per-doc
    * gate is a QUADRATICALLY MIXED content-hash ppm threshold —
    * replayable, no RNG, no shuffle beyond the vocabulary-sized source
    * counts (broadcast back). The mix is load-bearing: raw polynomial
    * hashes of sequentially-numbered texts ("doc 1", "doc 2", …) are
    * CONSECUTIVE integers, so an unmixed residue gate keeps all-or-none
    * of such a run (measured: 0 of 400 below a 50% threshold);
    * (h² + 3h + 7) mod P restores uniformity — the same structured-
    * low-bit lesson as the HLL and CDC hashes.
    * Output: kept (doc_id, source, rate_ppm). */
  def sqrtTemperatureSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val nMin = counts.agg(min(col("n")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col("source"),
        floor(sqrt(col("n_min").cast("double") / col("n").cast("double")) * 1000000)
          .cast("long").as("rate_ppm"))
    docs.join(broadcast(rates), "source")
      .filter(gateHash(TextHash.polyHash(col("text")), 1000000L) < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("rate_ppm"))
  }

  /** Quadratic-mix admission gate over a polynomial content hash:
    * ((h² + 3h + 7) mod P) mod `buckets`. Shared by the mixture and
    * temperature samplers; [[gateHashSql]] is the oracle mirror. */
  private[graft] def gateHash(h: Column, buckets: Long): Column =
    ((h * h + lit(3L) * h + lit(7L)) % TextHash.P) % buckets

  private[graft] def gateHashSql(h: String, buckets: Long): String =
    s"((($h) * ($h) + 3 * ($h) + 7) % ${TextHash.P}) % $buckets"

  /** Deterministic weighted priority sample of k docs: priority =
    * mix(doc_id) div weight (the integer-exact analog of the
    * Efraimidis–Spirakis exponential-clock keys — u^(1/w) needs libm;
    * `uniform div w` keeps the monotone heavier-weight → smaller-key →
    * more-likely property and replays bit-identically in both engines),
    * mix = the quadratic (d² + 3d + 7) mod P over d = doc_id mod P (raw
    * polynomial ids have structured residues; same rationale as the HLL
    * and CDC mixes). Take the k SMALLEST priorities.
    *
    * Scale shape: `orderBy(...).limit(k)` plans as TakeOrderedAndProject
    * — each partition keeps its local top-k heap and the driver merges
    * k·numPartitions rows, so there is NO global sort and NO shuffle of
    * the corpus; replayable (same k, same weights → same sample), and
    * weights can be any positive bigint column (tokens, chars, quality
    * ranks). */
  def weightedPrioritySample(docs: DataFrame, k: Int, weight: Column): DataFrame = {
    val P = TextHash.P
    docs.select(col("doc_id"), weight.cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("pm", col("doc_id") % P)
      .withColumn("priority",
        expr(s"((pm * pm + 3 * pm + 7) % $P) div w"))
      .select(col("doc_id"), col("w"), col("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }
}
