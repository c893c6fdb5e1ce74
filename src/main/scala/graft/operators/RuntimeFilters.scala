package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter rule) —
 * the x-family measured pair for the semi-join-reduction topology.
 *
 * At 100 TB the dominant cost of a fact-to-selective-dim shuffle join is
 * shuffling fact rows that will not survive the join. Spark can inject a
 * bloom filter built from the (filtered) creation side as a predicate on
 * the probe side's SCAN, dropping non-joining fact rows before they ever
 * reach the exchange — the classic semi-join reduction, automated. The
 * feature is conf-gated by size thresholds tuned for cluster scale
 * (`applicationSideScanSizeThreshold` = 10 GB by default), so at bench SF
 * it never triggers on its own; x06 lowers the thresholds to measure the
 * topology, restoring every conf afterwards (the s15 Verify-safety
 * discipline — other entries' plans must not see the thresholds).
 *
 * x05 is the stock arm, x06 the bloom arm; both share one oracle, so the
 * hash pins that the injected filter never changes results. The spec
 * asserts the `might_contain(bloom_filter_agg(...))` runtime filter is
 * genuinely present in x06's executed probe-side plan (and absent from
 * x05's).
 */
object RuntimeFilters {

  private val Enabled =
    "spark.sql.optimizer.runtime.bloomFilter.enabled"
  private val AppThresh =
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
  private val CreateThresh =
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"

  /** The measured join: lineitem (probe) against the ~20% of orders that
    * are 1-URGENT (creation side, selective filter — the shape the rule
    * targets). shuffle_hash hints keep the dim out of broadcast: a
    * broadcast join needs no bloom (the build side already prunes at the
    * probe), so the shuffle topology is the one under measurement. */
  private[graft] def urgentRevenue(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(urgent.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        // scale 6: the 2dp x 2dp product has 4 exact decimal digits, so
        // the 6dp snap sits far from any rounding boundary (q30's rule)
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("revenue"))
  }

  /** x05: the stock arm — plain shuffle join, every lineitem row pays the
    * exchange whether or not its order is urgent. */
  def bloomOff(s: SparkSession, d: String): DataFrame = urgentRevenue(s, d)

  /** x06: the bloom arm — runtime filter thresholds lowered so
    * InjectRuntimeFilter fires at bench SF, then restored. The join runs
    * to completion INSIDE the conf window (the result is a 1-row
    * aggregate, so materializing it here is O(1) driver state) and is
    * re-wrapped as a local frame, keeping every other entry's plan
    * outside the threshold override. */
  def bloomOn(s: SparkSession, d: String): DataFrame =
    withBloomConfs(s) {
      val df = urgentRevenue(s, d)
      val rows = df.collect()
      // post-execution adaptive plan: the injected bloom-filtered join is
      // what the manifest must audit, not the LocalTableScan wrapper
      graft.plans.PlanDigest.recordSidePlan("adaptive bloom", df)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    }

  /** Run `body` with runtime bloom filters force-enabled, restoring the
    * prior conf values (or their absence) afterwards. Auto-broadcast is
    * disabled inside the window: InjectRuntimeFilter deliberately skips
    * any join it could plan as broadcast (a broadcast build side already
    * prunes at the probe), and at bench SF every dim is broadcastable —
    * at the 100 TB shape under measurement it is not. */
  private[graft] def withBloomConfs[A](s: SparkSession)(body: => A): A = {
    val keys = Seq(Enabled, AppThresh, CreateThresh,
      "spark.sql.autoBroadcastJoinThreshold")
    val prior = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set(Enabled, "true")
      s.conf.set(AppThresh, "0")
      s.conf.set(CreateThresh, "256MB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
