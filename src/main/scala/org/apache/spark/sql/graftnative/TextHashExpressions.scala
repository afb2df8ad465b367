package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass implementations of the engine's deterministic text hashes
  * (polynomial char hash / word hashes / word-trigram shingle hashes —
  * semantics defined in `graft.functions.TextHash`, mirrored by the
  * DuckDB oracle SQL).
  *
  * Why native: the composable Column forms nest HigherOrderFunctions
  * (`transform(split(...), w -> aggregate(...))`), which Catalyst
  * interprets per row, and the shingle window re-evaluates the whole
  * word-hash subtree per `element_at` reference — quadratic per document.
  * These expressions hash a document in one linear pass; codegen emits a
  * static call, keeping the surrounding operators in whole-stage codegen.
  *
  * Exactness contract (oracle relies on it): tokenization is a plain
  * split on U+0020 keeping empty tokens (Spark `split(text, ' ')` with
  * limit -1 ≡ DuckDB `string_split(text, ' ')`); per-token fold is over
  * Unicode code points seeded with the first (≡ `ascii()` over
  * `string_split(w, '')` chars + `list_reduce`); all arithmetic is Long
  * mod P. An empty token hashes to 0 (unreachable on single-spaced
  * corpora; the fold form is undefined there too).
  */
object TextHashOps {
  val P = 1000000007L

  def polyHashString(s: String): Long = {
    if (s.isEmpty) return 0L
    var acc = -1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = if (acc < 0) cp.toLong else (acc * 31 + cp) % P
    }
    acc
  }

  def polyHash(s: UTF8String): Long = polyHashString(s.toString)

  private def wordHashArray(s: UTF8String): Array[Long] = {
    val str = s.toString
    // split on single space, keeping empty tokens (limit -1 semantics)
    val words = str.split(" ", -1)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { out(i) = polyHashString(words(i)); i += 1 }
    out
  }

  def wordHashes(s: UTF8String): ArrayData =
    new GenericArrayData(wordHashArray(s))

  private def shingleHashArray(s: UTF8String): Array[Long] = {
    val w = wordHashArray(s)
    if (w.length < 3) return Array.empty[Long]
    val out = new Array[Long](w.length - 2)
    var i = 0
    while (i < w.length - 2) {
      out(i) = ((w(i) * 131 + w(i + 1)) % P * 131 + w(i + 2)) % P
      i += 1
    }
    out
  }

  def shingleHashes(s: UTF8String): ArrayData =
    new GenericArrayData(shingleHashArray(s))

  /** Winnowed fingerprints (the MOSS scheme): the sorted DISTINCT minima
    * of every `w`-wide window over the shingle-hash sequence — the
    * guarantee-bearing fingerprint subset (any shared run of ≥ w+k-1
    * tokens shares a fingerprint). One linear pass via a monotonic
    * deque (O(m), not O(m·w)); a doc with ≤ w shingles contributes its
    * single global minimum; no shingles → empty. */
  def winnowHashes(s: UTF8String, w: Int): ArrayData = {
    val h = shingleHashArray(s)
    val m = h.length
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = h(0); var i = 1
      while (i < m) { if (h(i) < mn) mn = h(i); i += 1 }
      sel.add(mn)
    } else {
      // deque of indices, values increasing front→back
      val dq = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      var i = 0
      while (i < m) {
        while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(h(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Sorted DISTINCT shingle hashes narrowed to int — every hash lives
    * in [0, P) with P < 2³¹, so the narrowing is lossless (the same
    * bound the 48-bit SimHash construction relies on). The int form
    * halves the bytes a set-carrying exchange ships, and the sort makes
    * per-pair exact intersection a zero-allocation merge scan
    * ([[sortedIntersectCount]]) instead of ArrayIntersect's per-row
    * hash set — the difference between the verify arithmetic living
    * inside a join's output projection and dominating it. */
  def shingleSetInts(s: UTF8String): ArrayData = {
    val h = shingleHashArray(s)
    if (h.length == 0) return new GenericArrayData(Array.empty[Int])
    java.util.Arrays.sort(h)
    val out = new Array[Int](h.length)
    var n = 0
    var i = 0
    while (i < h.length) {
      val v = h(i).toInt
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      i += 1
    }
    new GenericArrayData(if (n == h.length) out else java.util.Arrays.copyOf(out, n))
  }

  /** |A ∩ B| of two SORTED distinct int arrays in O(|A|+|B|) with zero
    * allocation. Exactly ArrayIntersect-then-size semantics on sorted
    * distinct inputs, minus the per-row OpenHashSet build and the
    * materialized intersection array neither caller needs. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** 13-gram hashes (decontamination unit): gram i = fold over word
    * hashes w(i)..w(i+12) of (acc·131 + w) mod P, seeded with w(i) —
    * operation-order identical to `graft.operators.Dedup.gram13Sql`.
    * Docs under 13 tokens yield an empty array. */
  def gram13Hashes(s: UTF8String): ArrayData = {
    val w = wordHashArray(s)
    if (w.length < 13) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](w.length - 12)
    var i = 0
    while (i < w.length - 12) {
      var acc = w(i)
      var j = 1
      while (j < 13) { acc = (acc * 131 + w(i + j)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunk hashes (rolling-hash CDC over the token
    * stream — the rsync/LBFS boundary scheme applied to words): token i
    * (1-based) starts a new chunk iff i = 1 or the word-trigram shingle
    * ending at token i-1 (covering tokens i-3..i-1, so the decision uses
    * only PRECEDING content — an insertion re-synchronizes boundaries
    * after ~divisor tokens) satisfies `mix(shingle) % divisor == 0`,
    * where mix is the quadratic (h² + 3h + 7) mod P. The mix matters:
    * polynomial hashes carry structured LOW bits (e.g. every repeated-
    * char token hashes to a multiple of 32, and small shingles never
    * wrap past P), so gating on the raw residue degenerates to
    * boundary-everywhere on such corpora — the same low-bit bias the
    * HLL rank hash needed a quadratic round for. Each chunk folds its
    * word hashes as (acc·131 + w) mod P seeded with the first, and is
    * packed as `hash·131072 + min(len, 131071)` so one array<long>
    * carries both. Expected chunk length ≈ divisor tokens. Empty text
    * yields the single chunk of the empty token. */
  def cdcChunkHashes(s: UTF8String, divisor: Int): ArrayData = {
    val w = wordHashArray(s)
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var acc = 0L
    var clen = 0
    var i = 0
    while (i < n) {
      val boundary = i >= 3 && {
        val sh = ((w(i - 3) * 131 + w(i - 2)) % P * 131 + w(i - 1)) % P
        (sh * sh + 3 * sh + 7) % P % divisor == 0
      }
      if (boundary && clen > 0) {
        out += acc * 131072 + math.min(clen, 131071)
        clen = 0
      }
      acc = if (clen == 0) w(i) else (acc * 131 + w(i)) % P
      clen += 1
      i += 1
    }
    out += acc * 131072 + math.min(clen, 131071)
    new GenericArrayData(out.toArray)
  }

  /** All combo-band rows of one packed hamming fingerprint: element i is
    * the struct (b = i, v = concatenated bits of combo i's blocks,
    * fm, fv) for the C(m, c) pigeonhole combos. Bit extraction is the
    * exact arithmetic of the Column form it replaces —
    * `v = (v << len) + ((h >> off) & ((1 << len) − 1))` per block,
    * left-to-right over the combo — so the DuckDB oracles replaying the
    * banding from the same block/combo tables still hash-match. */
  def comboBandStructs(h: Long, offs: Array[Int], lens: Array[Int],
      combos: Array[Array[Int]], fms: Array[Long], fvs: Array[Long]): ArrayData = {
    val out = new Array[Any](combos.length)
    var i = 0
    while (i < combos.length) {
      val combo = combos(i)
      var v = 0L
      var j = 0
      while (j < combo.length) {
        val b = combo(j)
        v = (v << lens(b)) + ((h >> offs(b)) & ((1L << lens(b)) - 1))
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](i, v, fms(i), fvs(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

sealed abstract class TextHashExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  /** Deterministic pure function of the child → a literal input
    * constant-folds at plan time (stock Catalyst rule). */
  override def foldable: Boolean = child.foldable

  /** Fully-qualified static call target for codegen. */
  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.TextHashOps.$staticCall($c);")
}

/** Polynomial code-point hash of a whole string (document fingerprint). */
case class PolyHash(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"
  override protected def staticCall: String = "polyHash"
  override def nullSafeEval(s: Any): Any =
    TextHashOps.polyHash(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

/** Per-token polynomial hashes: array<long>, one element per token. */
case class WordHashes(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordhashes"
  override protected def staticCall: String = "wordHashes"
  override def nullSafeEval(s: Any): Any =
    TextHashOps.wordHashes(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): WordHashes = copy(child = c)
}

/** Word-trigram shingle hashes: array<long>, n-2 elements (empty if n<3). */
case class ShingleHashes(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shinglehashes"
  override protected def staticCall: String = "shingleHashes"
  override def nullSafeEval(s: Any): Any =
    TextHashOps.shingleHashes(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** 13-gram hashes: array<long>, n-12 elements (empty if n<13). One linear
  * pass and one compiled method — the unrolled `transform(sequence(...))`
  * form it replaces emitted 13 `element_at`s per gram position inside one
  * giant generated method (~490 positions per doc worst-case), whose JIT
  * pressure showed up as q47's full-bench outlier. */
case class Gram13Hashes(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram13hashes"
  override protected def staticCall: String = "gram13Hashes"
  override def nullSafeEval(s: Any): Any =
    TextHashOps.gram13Hashes(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Gram13Hashes = copy(child = c)
}

/** Winnowed fingerprints: sorted distinct sliding-window minima of the
  * shingle hashes (window size `w`). */
case class WinnowHashes(child: Expression, w: Int) extends TextHashExpression {
  require(w >= 1, "winnow window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowhashes"
  override protected def staticCall: String = "winnowHashes" // unused (doGenCode below)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.TextHashOps.winnowHashes($c, $w);")
  override def nullSafeEval(s: Any): Any =
    TextHashOps.winnowHashes(s.asInstanceOf[UTF8String], w)
  override protected def withNewChildInternal(c: Expression): WinnowHashes = copy(child = c)
}

/** Sorted distinct shingle hashes as array<int> (lossless: hashes < P < 2³¹). */
case class ShingleSetInts(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_shinglesetints"
  override protected def staticCall: String = "shingleSetInts"
  override def nullSafeEval(s: Any): Any =
    TextHashOps.shingleSetInts(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): ShingleSetInts = copy(child = c)
}

/** Exact |A ∩ B| over two sorted distinct int arrays — one merge scan,
  * no per-row allocation; codegen is a static call so the surrounding
  * join projection stays in whole-stage codegen. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sortedintersectcount"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftnative.TextHashOps.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Content-defined chunk hashes packed as hash·131072 + min(len, 131071):
  * one linear pass computing tokenization, the rolling boundary shingle,
  * and the per-chunk fold together (no materialized intermediate arrays). */
case class CdcChunkHashes(child: Expression, divisor: Int) extends TextHashExpression {
  require(divisor >= 2, "cdc divisor must be >= 2")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdcchunkhashes"
  override protected def staticCall: String = "cdcChunkHashes" // unused (doGenCode below)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.TextHashOps.cdcChunkHashes($c, $divisor);")
  override def nullSafeEval(s: Any): Any =
    TextHashOps.cdcChunkHashes(s.asInstanceOf[UTF8String], divisor)
  override protected def withNewChildInternal(c: Expression): CdcChunkHashes = copy(child = c)
}

/** All C(m, c) combo-band rows of a packed hamming fingerprint as ONE
  * compiled loop, with the block/combo tables riding as codegen
  * reference objects ([[TextHashOps.comboBandStructs]] does the work).
  *
  * Why custom (round-10 judge finding): the composable form —
  * `explode(array(struct…))` with one literal arm per combo — is a
  * single Catalyst expression tree whose generated
  * `generate_doConsume` method grows linearly in C(m, c); at the wide
  * plans the measured chooser picks for dense corpora (m=10/c=4 → 210
  * arms) it exceeds Janino's hard 64 KB method limit, the stage FAILS
  * compilation (`ERROR CodeGenerator: Code grows beyond 64 KB`) and
  * runs interpreted with a per-task compile retry — correct but
  * bytecode-speed, precisely on the corpora big enough to need the
  * wide plan. This expression emits the same array from one
  * fixed-size static call, so the Generate stage stays inside
  * whole-stage codegen at every (m, c); NativeCodegenSpec gates it
  * under CODEGEN_ONLY at the widest plan the chooser can pick. */
case class ComboBandStructs(child: Expression, offs: Array[Int],
    lens: Array[Int], combos: Array[Array[Int]], fms: Array[Long],
    fvs: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(offs.length == lens.length,
    s"comboBandStructs: ${offs.length} offsets vs ${lens.length} lengths")
  require(combos.nonEmpty, "comboBandStructs needs >= 1 combo")
  require(combos.length == fms.length && combos.length == fvs.length,
    s"comboBandStructs: ${combos.length} combos vs ${fms.length} fm / ${fvs.length} fv")
  require(combos.forall(c => c.nonEmpty && c.forall(b => b >= 0 && b < offs.length)),
    "comboBandStructs: every combo must index into the block table")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("fm", LongType, nullable = false),
    StructField("fv", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_combobands"

  override def nullSafeEval(h: Any): Any =
    TextHashOps.comboBandStructs(h.asInstanceOf[Long], offs, lens, combos, fms, fvs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = ctx.addReferenceObj("offs", offs, "int[]")
    val l = ctx.addReferenceObj("lens", lens, "int[]")
    val cs = ctx.addReferenceObj("combos", combos, "int[][]")
    val fm = ctx.addReferenceObj("fms", fms, "long[]")
    val fv = ctx.addReferenceObj("fvs", fvs, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = org.apache.spark.sql.graftnative.TextHashOps" +
        s".comboBandStructs($h, $o, $l, $cs, $fm, $fv);")
  }

  override protected def withNewChildInternal(c: Expression): ComboBandStructs =
    copy(child = c)
}

object TextHashExpressions {
  def polyHash(c: Column): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(c)))
  def wordHashes(c: Column): Column =
    ExpressionUtils.column(WordHashes(ExpressionUtils.expression(c)))
  def shingleHashes(c: Column): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(c)))
  def gram13Hashes(c: Column): Column =
    ExpressionUtils.column(Gram13Hashes(ExpressionUtils.expression(c)))
  def winnowHashes(c: Column, w: Int): Column =
    ExpressionUtils.column(WinnowHashes(ExpressionUtils.expression(c), w))
  def shingleSetInts(c: Column): Column =
    ExpressionUtils.column(ShingleSetInts(ExpressionUtils.expression(c)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def cdcChunkHashes(c: Column, divisor: Int): Column =
    ExpressionUtils.column(CdcChunkHashes(ExpressionUtils.expression(c), divisor))

  /** Combo-band struct array for `h` under (blockDefs = (offset, len)
    * per block, comboDefs = block-index subsets). fm/fv are the
    * first-agreeing-combo dedup literals (see Dedup.bandedHammingPairs):
    * fm masks the agree bitmap up to the combo's highest block, fv is
    * the combo's own block set. */
  def comboBandStructs(h: Column, blockDefs: Seq[(Int, Int)],
      comboDefs: Seq[Seq[Int]]): Column = {
    val offs = blockDefs.map(_._1).toArray
    val lens = blockDefs.map(_._2).toArray
    val combos = comboDefs.map(_.toArray).toArray
    val fms = comboDefs.map(c => (1L << (c.last + 1)) - 1).toArray
    val fvs = comboDefs.map(_.map(b => 1L << b).sum).toArray
    ExpressionUtils.column(ComboBandStructs(ExpressionUtils.expression(h),
      offs, lens, combos, fms, fvs))
  }
}
