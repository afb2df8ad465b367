package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.{StringNormExpressions, StringNormOps}

/** Pins the native NFC and Jaro–Winkler expressions: NFC against JDK
  * ground truth on composed/decomposed pairs, Jaro–Winkler BIT-FOR-BIT
  * against a DuckDB-generated fixture (src/test/resources/
  * jaro_duckdb.tsv: 404 pairs — random, mutated, and customer-name
  * shaped — each with `jaro_winkler_similarity`'s raw IEEE-754 bits),
  * plus codegen-path equality for both. */
class StringNormSpec extends SparkSpec {

  import spark.implicits._

  test("nfc composes decomposed sequences and is idempotent") {
    assert(StringNormOps.nfcStr("é") === "é")
    assert(StringNormOps.nfcStr("café") === "café")
    assert(StringNormOps.nfcStr("") === "")
    // Angstrom sign U+212B is NFC-normalized to Å U+00C5
    assert(StringNormOps.nfcStr("Å") === "Å")
  }

  test("jaroWinkler matches DuckDB bit-for-bit on the 404-pair fixture") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/jaro_duckdb.tsv"), "UTF-8")
    val rows = try src.getLines().toVector finally src.close()
    assert(rows.size === 404)
    var checked = 0
    rows.foreach { line =>
      // split preserving empty fields (both strings can be empty)
      val parts = line.split('\t')
      val a = if (parts.length > 0) parts(0) else ""
      val b = if (parts.length > 1) parts(1) else ""
      val bits = parts.last.toLong
      val got = StringNormOps.jaroWinklerStr(a, b)
      assert(java.lang.Double.doubleToLongBits(got) === bits,
        s"mismatch on (${a.take(20)}, ${b.take(20)}): got $got, " +
          s"duckdb ${java.lang.Double.longBitsToDouble(bits)}")
      checked += 1
    }
    assert(checked === 404)
  }

  test("expression (codegen path) equals the Scala function") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
        ("éclair", "éclair"), ("", ""))
      .toDF("a", "b")
    val got = df.select(
        StringNormExpressions.jaroWinkler(col("a"), col("b")).as("jw"),
        length(StringNormExpressions.nfc(col("a"))).as("na"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(got(0)._1 === StringNormOps.jaroWinklerStr("martha", "marhta"))
    assert(got(1)._1 === StringNormOps.jaroWinklerStr("dixon", "dicksonx"))
    assert(got(2)._2 === 6, "NFC folds e+combining-acute into one char")
    assert(got(3)._1 === 0.0)
  }
}
