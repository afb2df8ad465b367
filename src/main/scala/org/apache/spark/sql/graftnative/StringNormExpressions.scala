package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization and Jaro–Winkler similarity as codegen'd
  * Catalyst expressions — the text-canonicalization and fuzzy-comparator
  * primitives a curation pipeline runs before dedup/linkage (a corpus
  * mixing composed and decomposed accents hashes the "same" text to
  * different shingles; NFC first makes every downstream hash family see
  * one canonical byte sequence).
  *
  * Why native: both would otherwise be Scala UDFs — a codegen barrier
  * and per-row ser/de in the hottest map stage of the pipeline. As
  * expressions they stay inside whole-stage codegen as a static call.
  *
  * Exactness contract: NFC is `java.text.Normalizer` (the JDK
  * implementation of UAX #15 — same canonical composition the oracle's
  * `nfc_normalize` computes). Jaro–Winkler reproduces the DuckDB /
  * rapidfuzz convention bit-for-bit (verified empirically in
  * StringNormSpec and hash-gated by its registry row): either side
  * empty → 0.0; match window ⌊max(|a|,|b|)/2⌋−1; transpositions over
  * the matched-sequence disagreement count; jaro = (m/|a| + m/|b| +
  * (m−t)/m)/3 in that operation order; Winkler prefix bonus (≤ 4
  * codepoints, weight 0.1) applies only when jaro > 0.7. Comparison is
  * over Unicode CODE POINTS, matching DuckDB's UTF-8-aware scan.
  */
object StringNormOps {

  def nfc(s: UTF8String): UTF8String = UTF8String.fromString(nfcStr(s.toString))

  def nfcStr(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    jaroWinklerStr(a.toString, b.toString)

  def jaroWinklerStr(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val bound = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val jLo = math.max(0, i - bound)
      val jHi = math.min(lb, i + bound + 1)
      var j = jLo
      var found = false
      while (j < jHi && !found) {
        if (!mb(j) && a(i) == b(j)) { ma(i) = true; mb(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order, count slots
    // where they disagree; t = half that count
    var t2 = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a(i) != b(j)) t2 += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l.toDouble * 0.1 * (1.0 - jaro)
  }
}

/** NFC canonical composition of a string column. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def foldable: Boolean = child.foldable
  override def nullSafeEval(s: Any): Any =
    StringNormOps.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.StringNormOps.nfc($c);")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Jaro–Winkler similarity of two string columns (DuckDB/rapidfuzz
  * convention; see [[StringNormOps.jaroWinklerStr]]). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def foldable: Boolean = left.foldable && right.foldable
  override def nullSafeEval(a: Any, b: Any): Any =
    StringNormOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftnative.StringNormOps.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
}

object StringNormExpressions {
  def nfc(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL-name registration (`graft_nfc`, `graft_jaro_winkler`) so
    * `spark.sql` text reaches the native expressions too — same
    * bridge shape as `VectorExpressions.register`. Idempotent
    * (registerFunction replaces). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalize(children.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      })
  }
}
