package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.plans.CboSupport

/**
 * Statistics-fed planning: ANALYZE'd column statistics + CBO must change
 * a join ORDER at plan time — the decision AQE cannot make (AQE re-plans
 * exchanges it has observed; it never reorders the logical join tree).
 * This is the SHOW STATS → planner loop Presto users expect, wired to
 * Spark's cost-based optimizer.
 */
class CboSpec extends GraftSpec {

  private val tables = Seq("customer", "orders", "lineitem")

  /** Left-deep leaf order of the optimized plan's catalog relations. */
  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().flatMap {
      case r: LogicalRelation => r.catalogTable.map(_.identifier.table)
      case _ => None
    }

  // Declared in the WORST order for this data: the two biggest tables
  // (lineitem ⋈ orders) joined first, the tiny filtered dimension last.
  private val q = """
    SELECT c.c_mktsegment, COUNT(*) AS n
    FROM cbo_lineitem l
    JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
    JOIN cbo_customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_mktsegment"""

  test("ANALYZE feeds the catalog: row counts and column NDVs are recorded") {
    CboSupport.registerWithStats(spark, sf, tables)
    try {
      val stats = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("cbo_customer"))
        .stats
      assert(stats.isDefined, "ANALYZE must write table statistics")
      val rows = spark.table("cbo_customer").count()
      assert(stats.get.rowCount.contains(BigInt(rows)),
        s"catalog row count ${stats.get.rowCount} != actual $rows")
      val colStats = stats.get.colStats
      assert(colStats.contains("c_mktsegment") && colStats.contains("c_custkey"),
        s"FOR ALL COLUMNS must record per-column stats, got ${colStats.keySet}")
      assert(colStats("c_custkey").distinctCount.exists(_ > 0))
    } finally CboSupport.unregister(spark, tables)
  }

  test("CBO join reorder: stats move the filtered dimension ahead of the fact join") {
    CboSupport.registerWithStats(spark, sf, tables)
    // disable broadcast so the ORDER is what distinguishes the plans —
    // with every join a shuffle join, joining the filtered dimension
    // first is the only way to avoid the full fact ⋈ fact shuffle
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val baseline = spark.sql(q)
      val baseOrder = leafOrder(baseline.queryExecution.optimizedPlan)
      val baseRows = baseline.collect()
      assert(baseOrder == Seq("cbo_lineitem", "cbo_orders", "cbo_customer"),
        s"without CBO the declared (worst) order must survive: $baseOrder")

      val (cboOrder, cboRows) = CboSupport.withCbo(spark) {
        val df = spark.sql(q)
        (leafOrder(df.queryExecution.optimizedPlan), df.collect())
      }
      assert(cboOrder != baseOrder,
        s"stats-driven reorder must change the join order, still $cboOrder")
      // the reordered tree must not start with the two fact tables: the
      // filtered customer dimension participates in the FIRST join
      assert(cboOrder.take(2).contains("cbo_customer"),
        s"filtered dimension should join first, got $cboOrder")
      // plan change, identical answer
      assert(cboRows.toSeq == baseRows.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      CboSupport.unregister(spark, tables)
    }
  }

  test("CBO confs restore after the window; external drop keeps the parquet") {
    val before = (spark.conf.getOption("spark.sql.cbo.enabled"),
      spark.conf.getOption("spark.sql.cbo.joinReorder.enabled"))
    CboSupport.withCbo(spark) {
      assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
    }
    val after = (spark.conf.getOption("spark.sql.cbo.enabled"),
      spark.conf.getOption("spark.sql.cbo.joinReorder.enabled"))
    assert(after == before, s"conf window leaked: $before -> $after")
    // registration is external: drop must leave the source files intact
    CboSupport.registerWithStats(spark, sf, Seq("region"))
    CboSupport.unregister(spark, Seq("region"))
    assert(graft.sources.Tables.region(spark, sf).count() == 5)
  }
}
