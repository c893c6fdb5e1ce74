package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Salted equi-join for heavily skewed keys.
 *
 * AQE's skew-join splitting (on in GraftSession) handles most skew by
 * splitting oversized sort-merge partitions, but it can't help when a
 * single *build-side row* has a hot key matched by billions of probe rows
 * in one task's hash bucket. Salting fixes that shape: the skewed (large)
 * side gets a random salt in [0, salts), the small side is exploded once
 * per salt value, and the join key becomes (key, salt) — spreading each
 * hot key over `salts` tasks.
 *
 * Cost model: small side is replicated `salts` times (keep salts modest,
 * 8-64); large side gains one int column. Result equality with the plain
 * join is pinned by SkewJoinSpec.
 */
object SkewJoin {

  /** Inner equi-join of `large` with `small` on `key`, salted `salts` ways.
    * `rand(seed)` is per-row uniform; seed fixed for reproducible tests.
    *
    * INNER ONLY by construction: an outer variant would need the
    * unmatched-side null rows deduplicated across salt replicas (a small
    * row matched under salt 3 still produces `salts - 1` unmatched
    * replicas). Callers needing outer semantics must anti-join the salted
    * inner result back against each side instead. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salts: Int = 16, seed: Long = 42L): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = large.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Top-frequency keys of `df[key]` — the usual input for deciding
    * whether salting is warranted (pair with a threshold on count). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)

  // --- x01/x02: measured skew — the same hot-key join, plain vs salted ---

  /** Deliberately skewed join inputs: ~90% of lineitem maps to key 0, the
    * rest spreads over 1..999; the dim holds 12 weighted rows per key, so
    * the join's OUTPUT (12 rows per probe row) is the dominant cost and the
    * hot key's expansion all lands in one task unless salted. (12 replicas
    * keep the demo's hot task ~2x the salted arm without spending bench
    * seconds on sheer output volume — the topology, not the row count, is
    * what's under measurement.) The shuffle_hash hint keeps the dim out of
    * broadcast, because a broadcast join has no shuffle and would hide the
    * skew being measured. */
  private def hotInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // layout-aware fan-out of the probe side: the skew under measurement
    // lives in the JOIN shuffle (hash by k), which is identical either
    // way; fanning only parallelizes the one-row-group scan + projection
    // feeding it, for all four arms equally (x01/x02/x07/x08 share this
    // input and x01's oracle)
    val large = Tables.fanout(s, d, "lineitem").select(
      when(pmod(col("l_orderkey"), lit(100)) < 90, 0L)
        .otherwise(pmod(col("l_orderkey"), lit(1000))).as("k"),
      col("l_quantity"))
    val small = s.range(0, 12000).select(
      (col("id") % 1000).as("k"), ((col("id") % 1000) % 7 + 1).as("w"))
    (large, small.hint("shuffle_hash"))
  }

  private def weighted(joined: DataFrame): DataFrame =
    joined.agg(
      sum((col("l_quantity") * col("w")).cast(DecimalType(18, 2))).cast("double")
        .as("total"),
      count(lit(1)).as("n"))

  /** x01: the anti-pattern under measurement — one shuffle partition holds
    * the hot key's entire probe side. */
  def hotJoinPlain(s: SparkSession, d: String): DataFrame = {
    val (large, small) = hotInputs(s, d)
    weighted(large.join(small, Seq("k")))
  }

  /** x02: the fix — same join salted 16 ways, hot key spread over 16
    * tasks; identical result (pinned by the shared oracle). */
  def hotJoinSalted(s: SparkSession, d: String): DataFrame = {
    val (large, small) = hotInputs(s, d)
    weighted(saltedInnerJoin(large, small, "k", salts = 16))
  }

  // --- x07/x08: the same hot-key join, AQE skew-split off vs on ---
  // Salting (x02) is the MANUAL fix and the only one that reaches inside
  // a single hot hash bucket; AQE's OptimizeSkewedJoin is the AUTOMATED
  // fix for the common case — it splits an oversized shuffle partition
  // into sub-partitions at RUNTIME, replicating the matching build side,
  // with no query rewrite at all. The split is threshold-gated for
  // cluster scale (256 MB / factor 5 defaults — never trips at bench
  // SF), so x08 lowers the thresholds inside a restored conf window
  // (the x06 discipline) to measure the topology. Both arms share
  // x01's oracle: splitting a partition must never change the result.

  private val SkewEnabled = "spark.sql.adaptive.skewJoin.enabled"
  private val SkewThresh =
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
  private val SkewFactor = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
  private val Advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  private[graft] def withSkewConfs[A](s: SparkSession, on: Boolean)(body: => A): A = {
    val keys = Seq(SkewEnabled, SkewThresh, SkewFactor, Advisory,
      "spark.sql.autoBroadcastJoinThreshold")
    val prior = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set(SkewEnabled, on.toString)
      if (on) {
        // tiny thresholds: the hot partition is a few KB compressed at
        // spec/bench SF (256MB/factor-5 defaults are cluster-scale)
        s.conf.set(SkewThresh, "1KB")
        s.conf.set(SkewFactor, "2")
        s.conf.set(Advisory, "1KB")
      }
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** Run the hot join to completion inside a skew-conf window and
    * return (1-row local result, final adaptive plan string) — the
    * plan is read AFTER execution because OptimizeSkewedJoin is a
    * runtime re-plan: it does not exist pre-execution.
    *
    * The probe side is round-robin pre-partitioned 8 ways (both arms,
    * so the comparison and the oracle are untouched) because AQE
    * splits a skewed reduce partition by MAPPER RANGES — with the
    * whole table in one scan task (a single parquet file at small SF)
    * there is only one range and the split silently cannot happen.
    * The real-cluster lesson rides in the entry: skew handling needs
    * map-side parallelism to cut along, which a 100 TB scan has by
    * construction and a one-file toy input does not. */
  private[graft] def hotJoinAqe(s: SparkSession, d: String,
      on: Boolean): (DataFrame, String) =
    withSkewConfs(s, on) {
      val (large, small) = hotInputs(s, d)
      val df = weighted(large.repartition(8).join(small, Seq("k")))
      val rows = df.collect()
      // recorded AFTER execution: OptimizeSkewedJoin exists only in the
      // final adaptive plan, and that plan — not the LocalTableScan
      // wrapper the entry returns — is what the manifest must audit
      graft.plans.PlanDigest.recordSidePlan(s"adaptive skew=$on", df)
      (s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema),
        df.queryExecution.executedPlan.toString)
    }

  /** x07: the stock-shuffle arm with skew splitting disabled — the hot
    * key's entire probe side in one task. */
  def hotJoinAqeOff(s: SparkSession, d: String): DataFrame =
    hotJoinAqe(s, d, on = false)._1

  /** x08: AQE splits the oversized partition at runtime — no rewrite,
    * identical result (x01's oracle). */
  def hotJoinAqeOn(s: SparkSession, d: String): DataFrame =
    hotJoinAqe(s, d, on = true)._1
}
