package org.apache.spark.sql.graftnative

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-only codegen compile probe: generate and Janino-compile every
  * whole-stage-codegen span of a DataFrame's physical plan WITHOUT
  * executing it. The production path (`WholeStageCodegenExec.doExecute`)
  * catches compile failures and silently falls back to interpreted
  * evaluation — results stay correct, so no oracle can see the
  * regression; the only runtime symptom is an ERROR log line plus
  * bytecode-speed evaluation and a per-task compile retry. This probe
  * turns that class of defect (round-9 companion-eval calls, round-10
  * 64 KB combo-explode methods) into a cheap registry-wide test
  * assertion: compiling a span costs milliseconds and
  * `CodeGenerator.compile`'s cache collapses spans shared across
  * queries. Lives in the sql namespace for `doCodeGen()` access.
  *
  * AQE note: an `AdaptiveSparkPlanExec` is a leaf whose codegen spans
  * only exist after stage materialization, so callers must build the
  * plan under `spark.sql.adaptive.enabled=false` for the probe to see
  * anything; the probe throws if handed an un-collapsed adaptive plan
  * rather than silently probing nothing. */
object CodegenProbe {

  /** (spanRootNode, compileError) per failing whole-stage span; empty =
    * every span of the plan compiles. */
  def compileFailures(df: DataFrame): Seq[(String, String)] = {
    val plan = df.queryExecution.executedPlan
    require(!plan.exists(_.isInstanceOf[AdaptiveSparkPlanExec]),
      "CodegenProbe needs a non-adaptive plan (build it under " +
        "spark.sql.adaptive.enabled=false) - AQE hides codegen spans " +
        "until stages materialize, so probing an adaptive plan checks nothing")
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    spans.flatMap { w =>
      try {
        val (_, code) = w.doCodeGen()
        CodeGenerator.compile(code)
        None
      } catch {
        case e: Throwable =>
          Some((w.child.nodeName, String.valueOf(e.getMessage).take(500)))
      }
    }
  }

  /** Number of whole-stage spans the probe would compile (gate sanity:
    * a registry sweep that finds zero spans anywhere is probing air). */
  def spanCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w }.size
}
