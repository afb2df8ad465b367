package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.VectorExprs

/** SparkSessionExtensions entry point: enables the engine's native
  * expressions in ANY session via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  *
  * Injects `graft_fdot` (codegen'd float-vector dot product,
  * [[graft.functions.FloatVectorDot]]), the planner strategy for the
  * whole-operator as-of join
  * ([[org.apache.spark.sql.graftnative.AsOfJoinExec]] — the (c) tier of
  * the custom-operator ladder: logical node + strategy + physical
  * sort-merge operator), and the optimizer rule that rewrites naive
  * point-in-interval AND interval-overlap joins into the bucketed
  * equi-join shape ([[org.apache.spark.sql.graftnative.RangeJoinRewrite]];
  * bucket width tunable via `spark.graft.rangeJoin.bucketUs`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExprs.fdotFunction)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftnative.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftnative.RangeJoinRewrite)
  }
}
