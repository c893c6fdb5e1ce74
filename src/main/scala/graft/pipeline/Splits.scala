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
    * the sequential-greedy packing every dataloader expects.
    *
    * The running sum is a DISTRIBUTED prefix sum, not a per-split window
    * (which would funnel each split into one task): range-repartition on
    * the (split, order) key so the global sort order spans partitions,
    * take per-(partition, split) token totals (a `numPartitions x splits`
    * frame — bounded by the partition count, safe to collect at any
    * corpus size), turn them into per-partition starting offsets, and
    * stream each partition once adding its offset. Shard ids are
    * independent of where the range boundaries land, because the
    * global order itself is deterministic. */
  def shardPack(s: SparkSession, d: String, budget: Long = 2000L): DataFrame = {
    import s.implicits._
    val parts = math.max(s.sparkContext.defaultParallelism, 4)
    // eager checkpoint staging (plans.Checkpoints: localCheckpoint by
    // default, conf-switchable to reliable) because BOTH passes must
    // observe the SAME range boundaries: the range sampler's seed varies
    // per job, so two
    // unmaterialized executions of this exchange could place boundary
    // rows in different partitions and desynchronize the collected
    // offsets from the assignment pass. A cacheManager persist would do
    // the same job but leaks a session-lifetime cache entry per
    // invocation (and LRU eviction of it would silently reintroduce the
    // divergence); the checkpoint RDD instead dies with this frame's
    // lineage, reclaimed by the ContextCleaner once the returned report
    // is materialized.
    val docs = Tables.documents(s, d)
      .select(splitLabel(col("doc_id")).as("split"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        scatter(col("doc_id")).as("ord"))
      .repartitionByRange(parts, col("split"), col("ord"), col("doc_id"))
      .sortWithinPartitions(col("split"), col("ord"), col("doc_id"))
      .transform(graft.plans.Checkpoints.stage)
    // pass 1: per-(partition, split) totals — numPartitions x splits rows
    val partTotals = docs
      .groupBy(spark_partition_id().as("pid"), col("split"))
      .agg(sum(col("n_tokens")).as("tokens"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    // offset of (pid, split) = that split's tokens in all earlier partitions
    val offsets: Map[(Int, String), Long] = partTotals.map { case ((pid, sp), _) =>
      (pid, sp) -> partTotals.collect {
        case ((p2, s2), t) if s2 == sp && p2 < pid => t
      }.sum
    }.toMap
    val bOffsets = s.sparkContext.broadcast(offsets)
    // pass 2: stream each partition once, running sum from its offset
    val assigned = docs
      .select(col("split"), col("doc_id"), col("n_tokens"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val cum = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (sp, id, tok) =>
          val before = cum.getOrElse(sp,
            bOffsets.value.getOrElse((pid, sp), 0L))
          cum(sp) = before + tok
          (sp, id, tok, before / budget)
        }
      }
      .toDF("split", "doc_id", "n_tokens", "shard_id")
    assigned
      .groupBy(col("split"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .orderBy(col("split"), col("shard_id"))
  }

  /** p06: deterministic global training shuffle — the order a dataloader
    * reads. rand()-based shuffling is partition-order-dependent and
    * unrepeatable; instead each doc's position is its key scatter: shard
    * = scatter % nShards (balanced, stable), position within shard =
    * scatter order. The window partitions BY SHARD, so at corpus scale
    * each shard sorts independently in parallel — there is no global
    * single-task sort anywhere. The report checksums the ORDER itself
    * (sum of position·doc_id), not just membership, so any change to the
    * shuffle order breaks the oracle hash. */
  def globalShuffle(s: SparkSession, d: String, nShards: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("pos_key"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), scatter(col("doc_id")).as("pos_key"),
        pmod(scatter(col("doc_id")), lit(nShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("pos") * col("doc_id")).as("order_checksum"))
      .orderBy(col("shard"))
  }

  /** p07: weighted source mixture — the up/down-sampling step every
    * training recipe applies (keep all of the curated sources, half of
    * the mid tier, a tenth of the web crawl). Sampling is a hash
    * threshold like q108, but with a DIFFERENT multiplier (48271,
    * MINSTD) than the split/shuffle scatter (69069): a shifted version
    * of the same hash would correlate the mixture with the train/val
    * split; a different multiplier decorrelates them. Pure narrow
    * filter; only the per-source report aggregates. */
  def mixture(s: SparkSession, d: String): DataFrame = {
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val threshold = when(srcNum < 5, lit(1048576L))   // keep 100%
      .when(srcNum < 10, lit(524288L))                // keep ~50%
      .otherwise(lit(104858L))                        // keep ~10%
    Tables.documents(s, d)
      .filter(pmod(col("doc_id") * lit(48271L) + lit(11L), lit(1048576L)) < threshold)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** p08: cross-split leakage audit — near-duplicate pairs (MinHash LSH,
    * the d02 kernel verbatim) that straddle train/val/test splits. Exact
    * dedup before splitting still leaves NEAR-dups of a test doc in
    * train, which silently inflates eval scores — this is the audit every
    * split rollout runs. Topology: one signature pass, one (band, bucket)
    * hash shuffle, bounded pair expansion (all inherited from the dedup
    * kernel), then the tiny pair set joins the narrow split labels; the
    * corpus never shuffles twice. The (lo, hi) split labels are
    * canonically ordered so A→B and B→A leaks land in one row. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = graft.dedup.Dedup.lshCandidatePairs(
      graft.dedup.Dedup.minhashBands(graft.dedup.Dedup.minhashSignatures(docs)))
    val labels = docs.select(col("doc_id"), splitLabel(col("doc_id")).as("split"))
    pairs
      .join(labels.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
      .join(labels.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"),
        (col("id_a") + col("id_b")).as("pair_sum"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("pair_sum")).as("pair_checksum"))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  /** p09: quality-curriculum sampling schedule — the staged data recipe
    * curriculum training uses: epoch 1 sees only the highest-quality bin,
    * epoch 2 adds half of the mid tier, epoch 3 adds a tenth of the low
    * tail. Bins come from the shared [[TextAnalysis.qualityScore]] kernel
    * (same arithmetic c01/t02 hash-verify); the keep decision is a hash
    * threshold with its own MINSTD multiplier (16807) — decorrelated from
    * both the split scatter (69069) and the mixture sampler (48271), so
    * curriculum membership can't correlate with split assignment. Scale
    * shape: the corpus is scanned ONCE and scored narrowly; the 9-row
    * (epoch, bin) schedule joins as a broadcast dim (the fan-out is per
    * epoch, bounded by the schedule length, not corpus size); only the
    * per-(epoch, bin) report aggregates. */
  def curriculum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sched = Seq(
      (1, "high", 1048576L), (1, "mid", 0L), (1, "low", 0L),
      (2, "high", 1048576L), (2, "mid", 524288L), (2, "low", 0L),
      (3, "high", 1048576L), (3, "mid", 1048576L), (3, "low", 104858L)
    ).toDF("epoch", "bin", "keep_below")
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        graft.text.TextAnalysis.qualityScore(col("text")).as("q"),
        pmod(col("doc_id") * lit(16807L) + lit(17L), lit(1048576L)).as("u"))
      .select(col("doc_id"), col("n_chars"), col("u"),
        when(col("q") >= 0.75, "high")
          .when(col("q") >= 0.5, "mid").otherwise("low").as("bin"))
      .join(broadcast(sched), Seq("bin"))
      .filter(col("u") < col("keep_below"))
      .groupBy(col("epoch"), col("bin"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("epoch"), col("bin"))
  }

  /** p10: training-sequence packing — greedy NEXT-FIT of whole documents
    * into fixed token-budget sequences, the packing a dataloader does
    * when documents must not split across sequences (contrast p05, whose
    * shard boundaries straddle documents). A sequence closes when the
    * next doc would overflow it; a doc larger than the budget gets a
    * sequence of its own (flagged `overflow`).
    *
    * Next-fit is inherently sequential state, so it runs as ONE streaming
    * pass per shard: hash-repartition by shard, sort within partitions on
    * the deterministic (scatter, doc_id) order, then a mapPartitions scan
    * whose state is two longs (current fill, sequence counter) reset at
    * each shard boundary — O(1) memory however large the shard, one
    * shuffle total, and the result is independent of how shards co-locate
    * because each shard is wholly contained in one partition and
    * processed in sorted order. Shards are the parallelism unit, as in
    * p06: at 100 TB you raise nShards with the cluster, never the state.
    * The oracle replays the same recurrence as a per-shard recursive CTE. */
  def packSequences(s: SparkSession, d: String, budget: Long = 1024L,
      nShards: Int = 16): DataFrame = {
    import s.implicits._
    val packed = Tables.documents(s, d)
      .select(pmod(scatter(col("doc_id")), lit(nShards.toLong)).as("shard"),
        scatter(col("doc_id")).as("ord"),
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var fill = 0L
        var seq = 0L
        it.map { case (sh, _, id, tok) =>
          if (sh != curShard) { curShard = sh; seq = 0L; fill = 0L }
          if (fill > 0 && fill + tok > budget) { seq += 1; fill = 0L }
          fill += tok
          (sh, seq, id, tok)
        }
      }
      .toDF("shard", "seq_id", "doc_id", "n_tokens")
    packed
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"))
      .select(col("shard"), col("seq_id"), col("n_docs"), col("seq_tokens"),
        (col("seq_tokens") > budget).as("overflow"))
      .orderBy(col("shard"), col("seq_id"))
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

  /**
   * p11: temperature-balanced source mixture — weights DERIVED from the
   * corpus (w_s ∝ n_s^τ, the multilingual-balancing recipe) instead of
   * p07's fixed rates. τ = 0.5 deliberately: sqrt is the ONE power IEEE
   * guarantees correctly rounded, so the per-source weight is bit-exact
   * cross-engine where n^0.7 would hang a keep/drop boundary on a
   * libm-ulp (the §5 transcendental discipline applied to sampling).
   * The sqrt-weight normalizer sums in DECIMAL (order-independent); the
   * keep rate is a fixed left-to-right double tree; the decision
   * threshold floors onto the 2^20 hash grid, and membership is the
   * usual hash-of-key test (MINSTD multiplier 69621 — decorrelated
   * from the split/mixture/curriculum samplers). One narrow corpus
   * scan + a source-count aggregate; rates broadcast back.
   */
  def temperatureMixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(sqrt(col("n_docs").cast("double")).cast(DecimalType(18, 6)))
        .cast("double").as("s_sum"),
      sum(col("n_docs")).as("n_total"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        least(lit(1.0),
          (expr("n_total div 2").cast("double") *
            sqrt(col("n_docs").cast("double")) / col("s_sum")) /
            col("n_docs").cast("double")).as("rate"))
      .select(col("source"), col("n_docs"), col("rate"),
        floor(col("rate") * 1048576).cast("long").as("thr"))
    val kept = docs.join(broadcast(rates.select(col("source"), col("thr"))), "source")
      .filter(pmod(col("doc_id") * lit(69621L) + lit(7L), lit(1048576L)) < col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_checksum"))
    rates.join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), round(col("rate"), 6).as("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"))
      .orderBy(col("source"))
  }

  /**
   * p13: epoch-based mixture WITH replacement — the upsampling half of
   * data mixing (Llama/PaLM recipes: low-resource sources repeat for
   * multiple epochs while high-resource sources see less than one pass;
   * p07/p11 cover the downsampling half). Per-source token budget
   * t_s = B·p_s with B = 2·|corpus| and the p11 sqrt-share
   * p_s ∝ √n_s (τ = 0.5 — the one power IEEE rounds correctly, so the
   * share can't fork cross-engine); a source's docs then replicate
   * full = ⌊t_s/n_s⌋ times each, and the fractional remainder epoch
   * takes the docs whose hash clears t_s mod n_s scaled onto the 2^20
   * grid — EXACT integer arithmetic from t_s onward (the only double is
   * the sqrt share itself). MINSTD multiplier 48271 — decorrelated from
   * the 69621-family split/mixture/curriculum samplers.
   *
   * Scale: the per-source plan frame is source-count-sized and
   * broadcast; the expansion is one narrow scan + explode whose output
   * is exactly the requested budget (~2× input here) — the op IS the
   * volume, there is no avoidable shuffle; the per-source report
   * aggregates with map-side partials. The checksum sums doc_id·epoch
   * over every EMITTED copy, so dropped or duplicated replicas fork
   * the hash, not just the counts.
   */
  def epochMixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(sqrt(col("n_docs").cast("double")).cast(DecimalType(18, 6)))
        .cast("double").as("s_sum"),
      sum(col("n_docs")).as("n_total"))
    val plan = counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        floor((col("n_total") * 2).cast("double") *
          sqrt(col("n_docs").cast("double")) / col("s_sum")).cast("long")
          .as("target"))
      .select(col("source"), col("n_docs"), col("target"),
        expr("target DIV n_docs").as("full_epochs"),
        expr("((target % n_docs) * 1048576) DIV n_docs").as("thr"))
    val expanded = docs.select(col("doc_id"), col("source"))
      .join(broadcast(plan), "source")
      .select(col("doc_id"), col("source"),
        (col("full_epochs") +
          when(pmod(col("doc_id") * 48271L + 11L, lit(1048576L)) < col("thr"), 1L)
            .otherwise(0L)).as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("epoch"))
    val report = expanded.groupBy(col("source")).agg(
      count(lit(1)).as("n_emitted"),
      countDistinct(col("doc_id")).as("n_docs_used"),
      max(col("epoch")).as("max_epoch"),
      sum(col("doc_id") * col("epoch")).as("checksum"))
    plan.join(report, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("target"), col("full_epochs"),
        coalesce(col("n_emitted"), lit(0L)).as("n_emitted"),
        coalesce(col("n_docs_used"), lit(0L)).as("n_docs_used"),
        coalesce(col("max_epoch"), lit(0L)).as("max_epoch"),
        coalesce(col("checksum"), lit(0L)).as("checksum"),
        round(coalesce(col("n_emitted"), lit(0L)).cast("double") /
          col("n_docs").cast("double"), 4).as("realized_epochs"))
      .orderBy(col("source"))
  }

  /**
   * p14: TOKEN-budget mixture — the unit real mixing recipes actually
   * budget in. p07/p11/p13 allocate in DOCUMENT space; training-data
   * recipes (Llama/PaLM mixture tables, the DoReMi setup) state per-
   * source shares of a TOKEN budget, and a source of long documents
   * must sample fewer docs to hit the same token share. Per-source
   * token mass n_s (t03's whitespace convention: split(trim(text)) —
   * the same count both engines replay), total budget B = half the
   * corpus tokens, share w_s ∝ √n_s (τ = 0.5 — the one power IEEE
   * rounds correctly, the p11 discipline), doc-sampling rate
   * r_s = min(1, B·w_s / n_s) floored onto the 2^20 hash grid, and the
   * realized kept-token mass rides in the result next to the rate so
   * the hash pins the allocation AND its outcome. MINSTD multiplier
   * 16807 — decorrelated from the 48271/69621-family samplers.
   *
   * Scale: per-source frames are source-count-sized and broadcast;
   * token counting is a narrow per-row projection inside the scan;
   * the kept-set report aggregates with map-side partials. Nothing in
   * the plan holds more than (sources × counters) state at any size.
   */
  def tokenBudgetMixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
    val counts = docs.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("tok_s"), count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(sqrt(col("tok_s").cast("double")).cast(DecimalType(18, 6)))
        .cast("double").as("s_sum"),
      sum(col("tok_s")).as("tok_total"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("source"), col("tok_s"), col("n_docs"),
        least(lit(1.0),
          (expr("tok_total div 2").cast("double") *
            sqrt(col("tok_s").cast("double")) / col("s_sum")) /
            col("tok_s").cast("double")).as("rate"))
      .select(col("source"), col("tok_s"), col("n_docs"), col("rate"),
        floor(col("rate") * 1048576).cast("long").as("thr"))
    val kept = docs.join(broadcast(rates.select(col("source"), col("thr"))), "source")
      .filter(pmod(col("doc_id") * lit(16807L) + lit(3L), lit(1048576L)) < col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_tokens"),
        sum(col("doc_id")).as("kept_checksum"))
    rates.join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("tok_s").as("n_tokens"),
        round(col("rate"), 6).as("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"))
      .orderBy(col("source"))
  }

  /** p15: fixed-size deterministic sample — "exactly N documents, the
    * SAME N on every run, every cluster layout, every partition count".
    * rand()-based reservoir sampling breaks all three (and breaks
    * retry idempotence: a recomputed partition resamples differently);
    * the content-addressed form ranks every doc by a seeded hash64 of
    * its id and takes the N smallest. That is a TakeOrdered: each task
    * keeps an N-row heap over its partition, one tiny merge at the
    * driver — no shuffle of the corpus, O(N) state anywhere, and the
    * chosen ids are a pure function of the corpus, so the 100 TB rerun
    * after a failed stage returns the identical sample. Trailing
    * presentation sort is over N rows only. */
  def reservoirSample(s: SparkSession, d: String, n: Int = 100): DataFrame = {
    import graft.functions.GraftFunctions
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        GraftFunctions.hash64(
          concat(lit("smp:"), col("doc_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(n)
      .orderBy(col("doc_id"))
  }
}
