package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Range (interval) join: match each left row to right rows whose time
 * falls in [start, start + width) for the same key-less or keyed stream.
 *
 * Spark compiles a bare inequality join to BroadcastNestedLoopJoin —
 * O(n·m) and a broadcast of a whole side, unusable at scale. The scale
 * form here is bucketization: quantize time into fixed-width buckets,
 * equi-join on the bucket id (left rows are exploded to each bucket their
 * interval overlaps — a bounded ceil(width/bucket)+1 factor), then apply
 * the exact range predicate as a post-filter. Cost: one hash shuffle per
 * side on the bucket key, pair expansion bounded per bucket — the same
 * discipline as the LSH dedup paths.
 */
object RangeJoin {

  /**
   * Inner range join of `left` (interval [startCol, startCol+widthSec))
   * against `right` (instant atCol), both epoch-second columns. Exact
   * semantics enforced by the residual predicate; the bucket join only
   * bounds the candidate space.
   */
  def byBucket(left: DataFrame, right: DataFrame, startCol: String,
               atCol: String, widthSec: Long, bucketSec: Long): DataFrame = {
    require(bucketSec > 0 && widthSec > 0, "width and bucket must be positive")
    val nBuckets = (widthSec + bucketSec - 1) / bucketSec + 1
    val l = left.withColumn("__bucket",
      explode(sequence(
        (col(startCol) / bucketSec).cast("long"),
        (col(startCol) / bucketSec).cast("long") + lit(nBuckets - 1))))
    val r = right.withColumn("__bucket", (col(atCol) / bucketSec).cast("long"))
    l.join(r, Seq("__bucket"))
      .filter(col(atCol) >= col(startCol) &&
        col(atCol) < col(startCol) + widthSec)
      .drop("__bucket")
  }

  /** q98: revenue of purchases landing within 2h after each 'signup'
    * event — a keyless time-interval attribution (bucketed, never a
    * nested loop). Window width bounds the join output (each probe
    * matches only the purchases inside its window), so pick it for the
    * question, not the engine: the topology is the same at any width. */
  def signupAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"),
        unix_timestamp(col("ts")).as("start_s"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(unix_timestamp(col("ts")).as("at_s"), col("value"))
    byBucket(signups, purchases, "start_s", "at_s",
      widthSec = 2L * 3600, bucketSec = 3600L)
      .groupBy(col("signup_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy(col("signup_id"))
  }
}
