package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Incremental corpus maintenance — the operators a continuously-refreshed
 * training corpus needs between full rebuilds: key-based upsert (MERGE
 * semantics on plain parquet) and batch-vs-corpus incremental dedup.
 *
 * Scale design: upsert is one union + one hash shuffle on the key (the
 * same cost as the latest-per-key compaction it generalizes); incremental
 * dedup shuffles only the slim (hash, id) projection of the NEW batch and
 * anti-joins it against the existing corpus's hash index — the existing
 * corpus text never moves.
 */
object Incremental {

  /**
   * MERGE-INTO semantics on plain DataFrames: rows from `updates` replace
   * same-key rows of `base`, unmatched keys pass through, ties within
   * `updates` resolved by highest `versionCol`. One unionByName + one
   * row_number shuffle on the key — no driver-side diffing.
   *
   * Version ties (two rows with the same key AND version) are broken by a
   * hash of the full row content, so the winner is a deterministic
   * function of the data — never of shuffle arrival order. Identical
   * duplicate rows hash equal, and then either copy is the same result.
   */
  def upsert(base: DataFrame, updates: DataFrame, key: String,
             versionCol: String): DataFrame = {
    val all = base.unionByName(updates)
    val contentHash = md5(concat_ws("\u0001",
      all.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, contentHash)
    all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * p03: corpus upsert — a v1 revision batch (every 4th doc, text
   * prepended with a revision marker) merged over the base corpus; emits
   * per-doc (version, content hash) so the oracle pins exactly which rows
   * the merge kept.
   */
  def upsertReport(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), lit(0).as("version"))
    val updates = Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"),
        concat(lit("[rev2] "), col("text")).as("text"),
        lit(1).as("version"))
    upsert(base, updates, "doc_id", "version")
      .select(col("doc_id"), col("version"), md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /**
   * p04: incremental dedup — classify an incoming batch (doc_id >= 400)
   * against the existing corpus (doc_id < 400) without reshuffling the
   * corpus: `dup_of_existing` (content hash already in the corpus index),
   * `dup_in_batch` (a lower-id batch doc has the same hash), or `new`.
   * The corpus side reduces to a distinct-hash index before the join, so
   * at 100 TB the join probes an index, not the corpus.
   */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val hashed = Tables.documents(s, d)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
    val existing = hashed.filter(col("doc_id") < 400)
      .select(col("h")).distinct()
      .withColumn("in_corpus", lit(true))
    // the incoming batch: fresh docs (id >= 400), re-crawled corpus pages
    // (every 40th existing doc re-ingested under a new id — the common
    // web-recrawl case), and a double submission within the batch itself
    // (every 50th fresh doc repeated under a new id)
    // alias offsets sit far above any real doc_id (50k at sf1.0): +10000
    // collided with real ids at the r15 sf1.0 gate, which made the final
    // ORDER BY doc_id non-total and the row order engine-dependent
    val batch = hashed.filter(col("doc_id") >= 400)
      .unionByName(hashed.filter(col("doc_id") < 400 && col("doc_id") % 40 === 0)
        .select((col("doc_id") + 10000000).as("doc_id"), col("h")))
      .unionByName(hashed.filter(col("doc_id") >= 400 && col("doc_id") % 50 === 0)
        .select((col("doc_id") + 20000000).as("doc_id"), col("h")))
    val wFirst = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    batch
      .withColumn("batch_rank", row_number().over(wFirst))
      .join(existing, Seq("h"), "left")
      .select(col("doc_id"),
        when(col("in_corpus"), "dup_of_existing")
          .when(col("batch_rank") > 1, "dup_in_batch")
          .otherwise("new").as("decision"))
      .orderBy(col("doc_id"))
  }

  /**
   * p12: incremental AGGREGATE maintenance — the materialized-view
   * delta-merge every continuously-loaded warehouse runs: a persisted
   * daily rollup (day × event_type → count + exact decimal sum) is
   * brought current by aggregating ONLY the new batch and merging it
   * with the stored state by key — history is never re-scanned. The
   * entry makes the persistence real (state written to and RELOADED
   * from parquet, the a15 discipline), and its oracle is the
   * FROM-SCRATCH recompute over all events — the defining invariant of
   * incremental view maintenance (merge ≡ rebuild) is exactly what the
   * hash compare pins.
   *
   * Exactness across the merge: per-batch sums accumulate in
   * DECIMAL(18,2) (the value column carries 2dp, so partial sums are
   * exact ⇒ re-summing partials is associative and order-free — the
   * property that makes count/sum/min/max maintainable and avg
   * derivable, while a double sum would fork on merge order). Scale
   * shape: the delta aggregation shuffles only the batch (map-side
   * combined into ≤ days×types rows); the merge unions two tiny rollup
   * frames and re-reduces — O(state), corpus-independent.
   */
  def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dir = sys.env.getOrElse("SPARK_GRAFT_STATE_DIR",
      System.getProperty("java.io.tmpdir") + "/graft_rollup_state")
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
    val cutoff = lit("2024-01-24").cast("date")
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_val"))
    // the "already materialized" state: built once from history, then
    // genuinely persisted and reloaded (nothing downstream may touch
    // the history scan again)
    rollup(ev.filter(col("day") < cutoff))
      .write.mode("overwrite").parquet(dir)
    val state = s.read.parquet(dir)
    val delta = rollup(ev.filter(col("day") >= cutoff))
    state.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_val")).as("sum_val"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"),
        col("sum_val").cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /**
   * p16: snapshot diff — CHANGE-DATA-CAPTURE derivation between two
   * corpus versions (the inverse of p03: upsert APPLIES a known change
   * set; a warehouse sync usually has to DERIVE it first — the
   * inserted/deleted/updated/unchanged classification every SCD load,
   * replication audit, and incremental re-train decision starts from).
   * v1 mutates v0 deterministically: every 10th doc deleted, every 4th
   * surviving doc revised, every 25th doc re-inserted under a new id.
   * Classification is a FULL OUTER join of the two (doc_id, md5) frames
   * — the content hashes are computed AT THE SCAN, so document text
   * never shuffles and the join moves 40-byte rows co-keyed on doc_id;
   * at 100 TB this hash-compare join IS the standard CDC topology.
   * The only driver-side value is the doc count (1-row scalar, the g01
   * class) for the synthetic insert ids.
   */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val n = docs.count()
    val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0, concat(lit("[rev2] "), col("text")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + n).as("doc_id"),
          concat(lit("[new] "), col("text")).as("text")))
    docs.select(col("doc_id"), md5(col("text")).as("v0_md5"))
      .join(v1.select(col("doc_id"), md5(col("text")).as("v1_md5")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("v0_md5").isNull, "inserted")
          .when(col("v1_md5").isNull, "deleted")
          .when(col("v0_md5") === col("v1_md5"), "unchanged")
          .otherwise("updated").as("change"),
        col("v0_md5"), col("v1_md5"))
      .orderBy(col("doc_id"))
  }
}
