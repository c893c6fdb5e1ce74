package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    * `rand(seed)` is per-row uniform; seed fixed for reproducible tests. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salts: Int = 16, seed: Long = 42L): DataFrame = {
    val salted = large.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-frequency keys of `df[key]` — the usual input for deciding
    * whether salting is warranted (pair with a threshold on count). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
