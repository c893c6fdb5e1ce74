package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Deterministic dataset splitting for training pipelines: train/val/test
 * assignment and per-stratum caps that are (a) stable across runs and
 * cluster layouts — no rand(), no partition-order dependence — and (b) a
 * pure narrow projection, no shuffle to assign.
 *
 * The scatter here hashes the stable doc_id (standing in for the content
 * fingerprint a production pipeline would use — `fingerprint64` exists in
 * graft.functions for that); the multiplier is sized so the product stays
 * inside Long for any plausible corpus (overflow needs ids > 1.3e14).
 */
object Splits {

  /** SQL-replayable multiplicative scatter of a sequential id. */
  private def scatter(id: Column): Column =
    pmod(id * lit(69069L) + lit(12345L), lit(1048576L))

  /** Split label with an 80/10/10 hash split — deterministic per doc. */
  def splitLabel(id: Column): Column = {
    val h = scatter(id) % 10
    when(h === 0, "val").when(h === 1, "test").otherwise("train")
  }

  /** p01: corpus split report — per-split doc counts and char volume.
    * Assignment is a narrow map; only the tiny report aggregates. */
  def splitReport(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(splitLabel(col("doc_id")).as("split"),
        col("lang"), col("n_chars"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))

  /** p05: training-shard packing — assign each doc to a ~`budget`-token
    * shard within its split, in deterministic hash order, and report
    * per-shard fill. shard_id = floor(preceding-token-volume / budget):
    * the sequential-greedy packing every dataloader expects, expressed as
    * a running sum. The window here partitions only by split (the
    * semantic reference); at 100 TB the same assignment runs as
    * repartitionByRange on the hash order + per-partition prefix sums
    * merged with partition offsets — two passes, no single-task window. */
  def shardPack(s: SparkSession, d: String, budget: Long = 2000L): DataFrame = {
    val w = Window.partitionBy(col("split"))
      .orderBy(scatter(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(splitLabel(col("doc_id")).as("split"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_id", ((col("cum") - col("n_tokens")) / budget).cast("long"))
      .groupBy(col("split"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .orderBy(col("split"), col("shard_id"))
  }

  /** p02: stratified cap — keep at most `cap` docs per language, chosen
    * by deterministic hash order (so the sample is stable and unbiased by
    * ingestion order). The window sorts only within each stratum; at
    * corpus scale each stratum's top-`cap` could instead run as a
    * per-partition TakeOrdered + merge, same semantics. */
  def stratifiedCap(s: SparkSession, d: String, cap: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(scatter(col("doc_id")), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("lang"))
  }
}
