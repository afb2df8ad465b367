package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.VectorExprs

/** SparkSessionExtensions entry point: enables the engine's native
  * expressions in ANY session via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  *
  * Currently injects `graft_fdot` (codegen'd float-vector dot product,
  * [[graft.functions.FloatVectorDot]]). Custom rules/strategies slot in
  * here (`injectOptimizerRule` / `injectPlannerStrategy`) if an operator
  * ever outgrows what stock Catalyst plans well.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExprs.fdotFunction)
  }
}
