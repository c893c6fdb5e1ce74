package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * As-of join: for each probe row, the latest build row whose time is <=
 * the probe's time, within the same key — the time-series enrichment
 * operator (trade↔quote, click↔view, reading↔calibration) that plain
 * equi-joins can't express.
 *
 * Spark has no ASOF JOIN operator; the naive encodings are a range
 * self-join (BroadcastNestedLoopJoin — O(n·m) per key) or a per-row
 * correlated subquery. The scale topology used here is union + ordered
 * window: tag both sides, hash-shuffle once on the key, sort each
 * partition by (time, side), and carry the last build row forward with
 * `last(..., ignoreNulls)` over a running frame. One shuffle + one sort,
 * identical cost shape to a sort-merge join — survives any corpus where a
 * per-key sort fits a task (same requirement as any window function).
 *
 * Build rows must be unique per (key, time); pre-aggregate the build side
 * otherwise (which row "the" match is would be undefined anyway).
 */
object AsOfJoin {

  /**
   * Left as-of join. Probe keeps ALL its columns; the matched build row
   * arrives as `<prefix><time>` and `<prefix><c>` for each value column
   * (nulls when no build row precedes the probe row).
   */
  def asOf(probe: DataFrame, build: DataFrame, key: String, time: String,
           valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val carried = time +: valueCols
    // build rows sort BEFORE probe rows at equal time (__side 0 < 1), so a
    // probe at exactly t matches a build at t — ASOF's >= semantics
    val b = build.select(
      col(key), col(time), lit(0).as("__side"),
      struct(carried.map(col): _*).as("__b"))
    val p = probe.withColumn("__side", lit(1))
    val tagged = p.unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val probeCols: Seq[Column] = probe.columns.toSeq.map(col)
    val matchedCols: Seq[Column] =
      carried.map(c => col(s"__m.$c").as(s"$prefix$c"))
    tagged
      .withColumn("__m", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols ++ matchedCols: _*)
  }

  /** q97: each click enriched with the same user's latest prior view —
    * the canonical as-of shape, oracle-verified against DuckDB's native
    * ASOF LEFT JOIN. */
  def clickLastView(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"))
    asOf(clicks, views, "user_id", "ts", Seq("view_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        col("click_value"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts"),
        col("asof_view_value").as("view_value"))
      .orderBy(col("event_id"))
  }
}
