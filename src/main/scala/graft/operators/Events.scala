package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Event-stream analytics, batch form. The same logical shapes run through
 * Structured Streaming (see graft.streaming.EventPipelines and
 * StreamingSpec); these batch versions are the oracle-verified semantics.
 */
object Events {

  /** e01: tumbling 1-hour window aggregation (time-bucketed rollup). */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_events"), col("total_value"), col("n_users"))
      .orderBy(col("hour_start"))

  /** e02: sessionization — 30-minute inactivity gap splits sessions.
    * Gap detection via lag + running sum; at scale this is one shuffle on
    * user_id and a sorted window per user (no cross-user state). */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
    val newSess = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1).otherwise(0)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), newSess.as("new_sess"))
      .select(col("user_id"),
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("sess_id"))
      .groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** e04: moving average over a bounded ROWS frame (last 4 events/user). */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("value"),
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double").as("mov_sum"),
        count(lit(1)).over(w).as("mov_n"))
      .withColumn("mov_avg", col("mov_sum") / col("mov_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** e03: per-event-type top-5 users by summed value (window top-k). */
  def topkUsers(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total").desc, col("user_id"))
    agg.select(col("event_type"), col("user_id"), col("total"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .orderBy(col("event_type"), col("rn"))
  }
}
