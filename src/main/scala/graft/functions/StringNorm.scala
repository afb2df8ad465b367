package graft.functions

import org.apache.spark.sql.Column

/** Column wrappers for the native string-canonicalization expressions
  * (`org.apache.spark.sql.graftnative.StringNormExpressions`): NFC
  * Unicode normalization and DuckDB-convention Jaro–Winkler similarity.
  */
object StringNorm {

  /** NFC canonical composition (UAX #15, JDK implementation — matches
    * DuckDB `nfc_normalize`). */
  def nfc(c: Column): Column =
    org.apache.spark.sql.graftnative.StringNormExpressions.nfc(c)

  /** Jaro–Winkler similarity, bit-identical to DuckDB's
    * `jaro_winkler_similarity` (fixture-pinned in StringNormSpec). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftnative.StringNormExpressions.jaroWinkler(a, b)
}
