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
    val large = Tables.lineitem(s, d).select(
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
}
