package graft.plans

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/**
 * Statistics-fed planning (CBO) — the SHOW STATS → planner loop the
 * reference engine's users expect: Presto 0.248 is a cost-based engine
 * whose ANALYZE / SHOW STATS surface exists to feed join ordering and
 * distribution decisions. Spark has the same loop behind three pieces
 * this object wires together:
 *
 *   1. catalog tables (temp views carry no statistics — the catalog
 *      entry is where ANALYZE writes),
 *   2. `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS` (row count +
 *      per-column NDV/min/max/nulls, the estimate-form of the s14
 *      SHOW STATS report),
 *   3. `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`,
 *      which make the optimizer USE those stats: join reordering is
 *      decided at PLAN time from column statistics — before a single
 *      task runs — which is exactly the decision AQE cannot make (AQE
 *      only re-plans exchanges it has already observed at runtime; it
 *      never changes the join ORDER of the logical plan).
 *
 * At 100 TB the difference is structural: a star join written
 * fact ⋈ fact ⋈ filtered-dim shuffles the two fact tables against each
 * other first unless plan-time statistics prove the filtered dimension
 * cuts one side down; CBO + ANALYZE is the lever that fixes the order
 * before the first shuffle is scheduled.
 *
 * Registration is EXTERNAL — `CREATE TABLE … USING parquet LOCATION` —
 * so no data is copied: the catalog entry points at the same files the
 * temp-view path reads (the reference's hive-connector model: a
 * metastore row over immutable files). ANALYZE's stats pass is one scan
 * per table, amortized across every query planned afterwards.
 */
object CboSupport {

  /** Catalog-table name for a warehouse table (kept distinct from the
    * temp-view names `Tables.registerAll` claims). */
  def tableName(name: String): String = s"cbo_$name"

  /** Register `tables` from a scale-factor dir as EXTERNAL parquet
    * catalog tables (no copy) and ANALYZE each with full column stats.
    * Idempotent: re-registration replaces the entry and re-analyzes
    * (fresh stats after data changes — the incremental-maintenance
    * story for statistics). */
  def registerWithStats(spark: SparkSession, dir: String,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      val name = tableName(t)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // the location is a filesystem path interpolated into SQL — escape
      // embedded single quotes so a quoted directory can't break the
      // statement (SQL string literals double them)
      val loc = Tables.path(dir, t).replace("'", "''")
      spark.sql(
        s"CREATE TABLE $name USING parquet LOCATION '$loc'")
      spark.sql(
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  /** Drop the catalog entries registered by [[registerWithStats]]
    * (external tables — the parquet files stay). */
  def unregister(spark: SparkSession, tables: Seq[String]): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${tableName(t)}"))

  /** Run `body` with the cost-based optimizer and stats-driven join
    * reorder enabled, restoring both confs after — the conf window that
    * turns the ANALYZE'd statistics into plan decisions. */
  def withCbo[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(spark.conf.set(_, "true"))
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
