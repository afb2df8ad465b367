package graft

import graft.operators.Maintenance
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Cost-based-optimizer demonstration: ANALYZE-collected statistics —
  * not join syntax, not heuristics — pick the join order of a 3-way
  * star join. Written fact-first (the worst order), the query must
  * reorder under CBO to join the FILTERED dimension first and the fact
  * table last, with the result unchanged. This is the Catalyst tier a
  * warehouse exercises after large loads: stats collection is table
  * maintenance (Maintenance.analyzeForCbo). */
class CboSpec extends SparkSpec {

  private val tables = Seq("cbo_lineitem", "cbo_orders", "cbo_customer")

  /** Left-deep leaf order of the join tree: the first two entries are
    * the innermost join's inputs, the last entry joins outermost. */
  private def joinLeaves(p: LogicalPlan): Seq[String] = p match {
    case j: Join => joinLeaves(j.left) ++ joinLeaves(j.right)
    case other => other.collect {
      case r: LogicalRelation => r.catalogTable.map(_.identifier.table)
    }.flatten
  }

  test("ANALYZE-backed join reorder: filtered dimension first, fact table last, result unchanged") {
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION " +
        s"'/root/testdata/sf0.01/${t.stripPrefix("cbo_")}.parquet'")
    }
    // fact-first syntax: without statistics Catalyst keeps this order,
    // shuffling the whole fact table against unfiltered orders first
    val q = """SELECT l.l_quantity, o.o_orderdate, c.c_name
              |FROM cbo_lineitem l
              |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
              |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
              |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin
    try {
      val before = joinLeaves(spark.sql(q).queryExecution.optimizedPlan)
      assert(before === Seq("cbo_lineitem", "cbo_orders", "cbo_customer"),
        s"without stats the syntactic order must hold, got $before")
      val expected = spark.sql(q).count()

      // CBO is RUNTIME configuration (GraftRuntime.enable), not a
      // test-local toggle — assert the session really carries it, since
      // that's what the driver's Verify/Bench/Cli sessions run with
      assert(spark.conf.get("spark.sql.cbo.enabled") === "true")
      assert(spark.conf.get("spark.sql.cbo.joinReorder.enabled") === "true")
      Maintenance.analyzeForCbo(spark, tables)
      val after = joinLeaves(spark.sql(q).queryExecution.optimizedPlan)
      assert(after.last === "cbo_lineitem",
        s"statistics must push the fact table to the OUTERMOST join, got $after")
      assert(after.take(2).toSet === Set("cbo_orders", "cbo_customer"),
        s"the filtered dimension must join first, got $after")
      assert(spark.sql(q).count() === expected, "reorder must not change the result")

      // and the stats are real: row counts visible on every relation
      tables.foreach { t =>
        val stats = spark.table(t).queryExecution.optimizedPlan.stats
        assert(stats.rowCount.exists(_ > 0), s"$t has no ANALYZE row count")
      }
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
