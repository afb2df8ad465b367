package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine text hashing primitives.
  *
  * Murmur/xxhash differ between engines, so every hash here is a plain
  * polynomial over code points in bigint arithmetic mod P — bit-identical
  * in Spark and the DuckDB oracle. Each Spark `Column` builder has a SQL
  * renderer kept in exact operation-order lockstep; change them together.
  *
  * Fold convention (DuckDB's `list_reduce` takes no initial value): the
  * seed is the FIRST element, the fold runs over the rest. The Spark side
  * reproduces that with `slice` + `aggregate`.
  */
object TextHash {

  /** Modulus for all polynomial hashes (largest 10-digit prime). */
  val P = 1000000007L

  // ---- polynomial char hash ------------------------------------------------

  /** h(s) = fold over code points c_i: acc = (acc*31 + c_i) mod P, seeded
    * with c_1. Nonempty input only. Backed by the native codegen'd
    * expression (org.apache.spark.sql.graftnative.PolyHash); the
    * equivalent fold form —
    * `aggregate(slice(codes,2,n-1), codes[1], (acc,x) -> (acc*31+x)%P)`
    * over `transform(split(c,''), ascii)` — is interpreted per row and
    * ~100× slower. */
  def polyHash(c: Column): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.polyHash(c)

  /** Empty-string contract edge: DuckDB's `list_reduce` errors on an empty
    * list where the native PolyHash returns 0, so the renderer guards with
    * CASE — the two sides now agree at the edge instead of the oracle
    * query erroring out. */
  def polyHashSql(c: String): String =
    s"CASE WHEN $c = '' THEN 0 ELSE " +
      s"list_reduce(list_transform(string_split($c, ''), ch -> CAST(ascii(ch) AS BIGINT)), (a, b) -> (a*31 + b) % $P) END"

  // ---- tokens & word hashes ------------------------------------------------

  /** Single-space tokenization (the documents corpus is single-spaced). */
  def tokens(c: Column): Column = split(c, " ")
  def tokensSql(c: String): String = s"string_split($c, ' ')"

  def wordHashes(c: Column): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.wordHashes(c)
  def wordHashesSql(c: String): String =
    s"list_transform(${tokensSql(c)}, w -> ${polyHashSql("w")})"

  // ---- word-trigram shingle hashes ----------------------------------------

  /** Shingle hash of words (w1,w2,w3): ((h1*131 + h2) mod P * 131 + h3) mod P.
    * Docs with < 3 tokens yield an empty array. Native one-pass expression:
    * the composable form (`transform(sequence(1,n-2), i -> f(whs[i..i+2]))`)
    * re-evaluates the whole word-hash subtree per element reference —
    * quadratic per document and interpreted. */
  def shingleHashes(c: Column): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.shingleHashes(c)

  /** 13-gram hashes (decontamination unit): gram i folds word hashes
    * w_i..w_{i+12} as (acc·131 + w) mod P seeded with w_i; docs under 13
    * tokens yield an empty array. Native one-pass expression (the SQL
    * mirror lives in `graft.operators.Dedup.gram13Sql`). */
  def gram13Hashes(c: Column): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.gram13Hashes(c)

  /** SQL over a column already holding the word-hash list. */
  def shingleHashesOverSql(whs: String): String =
    s"CASE WHEN len($whs) >= 3 THEN list_transform(generate_series(1, len($whs) - 2), " +
      s"i -> (($whs[i]*131 + $whs[i+1]) % $P * 131 + $whs[i+2]) % $P) " +
      s"ELSE [] END"

  /** Sorted DISTINCT shingle hashes as array<int> — lossless (hashes
    * live in [0, P), P < 2³¹), half the exchange bytes of the long
    * form, and a valid left/right input to [[sortedIntersectCount]].
    * The representation pair exists for verify stages that ship sets
    * through a shuffle and intersect them millions of times per task
    * (the fused winnow verify, `Dedup.winnowPairs`). */
  def shingleSetInts(c: Column): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.shingleSetInts(c)

  /** Exact |A ∩ B| of two [[shingleSetInts]] columns: one zero-allocation
    * merge scan per row, semantics ≡ size(array_intersect(a, b)) on
    * sorted distinct inputs. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.sortedIntersectCount(a, b)

  // ---- winnowed fingerprints (MOSS) ---------------------------------------

  /** Winnowed fingerprints: the sorted DISTINCT minima of every `w`-wide
    * window over the shingle-hash sequence — the classic winnowing
    * guarantee (two docs sharing a run of ≥ w+2 tokens share a
    * fingerprint) at 1/~(w/2) the storage of full shingle sets. Native
    * one-pass monotonic-deque expression; ≤ w shingles → the single
    * global minimum; no shingles → empty. */
  def winnowHashes(c: Column, w: Int = 4): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.winnowHashes(c, w)

  /** SQL over a column already holding the shingle-hash list (the oracle
    * runs the O(m·w) windowed form; list slicing is 1-based inclusive). */
  def winnowOverSql(shs: String, w: Int = 4): String =
    s"CASE WHEN len($shs) = 0 THEN [] " +
      s"WHEN len($shs) <= $w THEN [list_min($shs)] " +
      s"ELSE list_sort(list_distinct(list_transform(" +
      s"generate_series(1, len($shs) - ${w - 1}), i -> list_min($shs[i:i+${w - 1}])))) END"

  // ---- content-defined chunking --------------------------------------------

  /** Content-defined chunk hashes (rsync/LBFS-style CDC over the token
    * stream): token i starts a new chunk iff i = 1 or the quadratically
    * mixed word-trigram shingle ending at token i-1 hits
    * `% divisor == 0` — boundaries depend only on local content, so an
    * insertion re-synchronizes after ~divisor tokens and the chunks
    * AFTER the edit hash identically. The mix (h²+3h+7 mod P) is what
    * makes the gate uniform: raw polynomial residues have structured
    * low bits (see the native scaladoc). Each element packs
    * `chunkHash·131072 + min(len, 131071)`. Native one-pass expression. */
  def cdcChunkHashes(c: Column, divisor: Int = 16): Column =
    org.apache.spark.sql.graftnative.TextHashExpressions.cdcChunkHashes(c, divisor)

  /** SQL mirror over a doc table alias: rebuilds the chunk assignment
    * positionally (lateral position unnest + running boundary sum) and
    * folds each chunk with `list_reduce` — O(m·w) reference form vs the
    * native one-pass. Yields (doc_id, packed) rows. */
  def cdcChunkPackedSql(divisor: Int = 16): String =
    s"""WITH tok_cdc AS (SELECT doc_id, ${wordHashesSql("text")} AS whs FROM documents),
       |sh_cdc AS (SELECT doc_id, whs, ${shingleHashesOverSql("whs")} AS shs FROM tok_cdc),
       |pos_cdc AS (SELECT doc_id, whs, shs,
       |                   unnest(generate_series(1, len(whs))) AS i
       |            FROM sh_cdc WHERE len(whs) > 0),
       |b_cdc AS (SELECT doc_id, i, whs[i] AS wh,
       |                 CASE WHEN i = 1 OR (i >= 4 AND
       |                        (shs[i-3]*shs[i-3] + 3*shs[i-3] + 7) % $P % $divisor = 0)
       |                      THEN 1 ELSE 0 END AS nb
       |          FROM pos_cdc),
       |ck_cdc AS (SELECT doc_id, i, wh,
       |                  sum(nb) OVER (PARTITION BY doc_id ORDER BY i) AS chunk
       |           FROM b_cdc),
       |cl_cdc AS (SELECT doc_id, chunk, list(wh ORDER BY i) AS cw
       |           FROM ck_cdc GROUP BY 1, 2)
       |SELECT doc_id,
       |       list_reduce(cw, (a, x) -> (a * 131 + x) % $P) * 131072
       |         + least(len(cw), 131071) AS packed
       |FROM cl_cdc""".stripMargin

  // ---- seeded permutation for minhash -------------------------------------

  /** i-th minhash permutation: h_i(x) = ((2i+3)*x + 7i+1) mod P. */
  def permute(i: Column, x: Column): Column =
    ((lit(2) * i + 3) * x + lit(7) * i + 1) % P

  def permuteSql(i: String, x: String): String =
    s"((2*$i + 3)*$x + 7*$i + 1) % $P"
}
