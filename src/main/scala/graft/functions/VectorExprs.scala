package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftnative.VectorExpressions

/** Public surface for the engine's native vector expressions (the
  * implementation lives in `org.apache.spark.sql.graftnative` — see
  * [[org.apache.spark.sql.graftnative.FloatVectorDot]] for why). */
object VectorExprs {

  /** Codegen'd float-vector dot product, double accumulator. */
  def fdot(a: Column, b: Column): Column = VectorExpressions.fdot(a, b)

  /** SQL-function registration triple for SparkSessionExtensions. */
  def fdotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    VectorExpressions.fdotFunction

  /** Idempotent session-level registration → usable from SQL text:
    * `SELECT graft_fdot(a.embedding, b.embedding) ...`. */
  def register(spark: SparkSession): Unit = VectorExpressions.register(spark)
}
