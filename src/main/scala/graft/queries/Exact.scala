package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine exact-arithmetic helpers for the oracle-checked queries.
  *
  * The testdata money columns are exactly 2-decimal doubles, so a per-column
  * `DECIMAL(12,2)` cast is lossless and yields the identical decimal in
  * Spark and DuckDB. All downstream arithmetic then happens in decimal
  * (exact, order-independent) and the final cast to DOUBLE is exact as long
  * as the unscaled total stays below 2^53 — which a scale-2/4/6 decimal does
  * at the verification scale factors. Casting double *products* to
  * high-scale decimals (e.g. DECIMAL(28,10)) instead is NOT cross-engine
  * safe: the int128→double conversion of a 17+ digit unscaled total rounds
  * differently in DuckDB than Java's correctly-rounded BigDecimal#doubleValue.
  */
object Exact {

  /** Lossless decimal view of a 2-decimal money column (|x| < 1e10). */
  def money(c: Column): Column = c.cast("decimal(12,2)")

  /** Lossless decimal view of a 2-decimal rate column (|x| < 10). */
  def rate(c: Column): Column = c.cast("decimal(3,2)")

  /** `1 - rate` as DECIMAL(4,2). */
  def oneMinus(c: Column): Column = lit(1).cast("decimal(3,2)") - rate(c)

  /** `1 + rate` as DECIMAL(4,2). */
  def onePlus(c: Column): Column = lit(1).cast("decimal(3,2)") + rate(c)

  /** SQL renderings of the same. */
  def moneySql(c: String): String = s"CAST($c AS DECIMAL(12,2))"
  def rateSql(c: String): String = s"CAST($c AS DECIMAL(3,2))"
  def oneMinusSql(c: String): String = s"(CAST(1 AS DECIMAL(3,2)) - ${rateSql(c)})"
  def onePlusSql(c: String): String = s"(CAST(1 AS DECIMAL(3,2)) + ${rateSql(c)})"

  /** `extendedprice * (1 - discount)` in exact decimal: (12,2)*(4,2) → (17,4). */
  def revenue(price: Column, discount: Column): Column =
    money(price) * oneMinus(discount)

  def revenueSql(price: String, discount: String): String =
    s"(${moneySql(price)} * ${oneMinusSql(discount)})"
}
