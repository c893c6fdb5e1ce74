package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed EXACT percentile via histogram-narrowed selection — the
 * scale-safe replacement for Spark's builtin `percentile` aggregate
 * (reference surface: Presto 0.248 exposes both approx_percentile and
 * exact array-sorting percentile through its SQL engine; the builtin
 * exact form on either engine buffers EVERY group value in one
 * aggregation buffer, so with a handful of groups a 100x scale-up puts a
 * fact-table-sized value list in a single task's memory — the one
 * scale-killer-shaped plan the round-10 review flagged).
 *
 * This kernel computes the SAME bit-exact continuous-interpolation result
 * with bounded state per task:
 *
 *   pass 1 (corpus scan): per-group (count, min, max) — O(groups) rows.
 *   pass 2 (corpus scan): per-group equi-width 256-bin histogram counts
 *     — O(groups x bins) rows; a running sum over the <= 256 bins of a
 *     group locates, for each target order statistic k, the one bin
 *     containing the k-th smallest value and the count of values before
 *     that bin.
 *   pass 3 (corpus scan): rows are kept ONLY if their (group, bin) is a
 *     candidate (a broadcast semi-join against the O(groups x
 *     percentiles) candidate frame); the survivors reduce to per-distinct-
 *     value counts, and a running sum over the distinct values inside one
 *     (group, bin) reads off the k-th value exactly.
 *
 * Memory per task is O(bins) for the histogram and O(distinct values
 * inside one bin) for the final selection — never O(group size). With
 * equi-width bins a candidate bin holds ~n/256 of the mass for
 * well-spread data; if a domain concentrates harder, the same narrowing
 * step composes (re-bin inside the candidate interval) — one level is
 * enough for every domain in this schema, where per-bin distinct
 * cardinality is bounded by the value domain (e.g. quantities 1..50,
 * prices = quantity x part price), not by row count.
 *
 * Interpolation replicates Spark's Percentile.getPercentile exactly
 * (pos = p*(n-1); lower = floor(pos); higher = ceil(pos); result =
 * (higher-pos)*v_lo + (pos-lower)*v_hi, v_lo when higher == lower), so
 * swapping the builtin for this kernel is hash-invisible to the oracle.
 *
 * Input: a frame with columns (g, x: double). Output: one row per group
 * with one column per requested percentile, named p<100p> (p50, p90...).
 */
object ExactSelection {

  /** Bin count of the narrowing histogram — a constant of the kernel
    * (memory/selectivity trade), never a function of row count. */
  private[graft] val Bins = 256

  /** Pass 1: per-group bounds + count (O(groups) rows, map-side combined). */
  private def groupStats(base: DataFrame): DataFrame =
    base.groupBy(col("g"))
      .agg(count(col("x")).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))

  /** Exact order statistic per (group, 1-indexed rank) for all ranks
    * needed by `ps`, via the three passes above. Returns (g, p, v_lo,
    * v_hi, pos) — the two bracketing order statistics and the fractional
    * position, ready for interpolation. */
  private def bracketValues(base: DataFrame, ps: Seq[Double]): DataFrame = {
    val stats = groupStats(base)

    // target ranks: for each percentile p, the 1-indexed ranks
    // floor(pos)+1 and ceil(pos)+1 bracketing pos = p*(n-1)
    val pArr = array(ps.map(lit): _*)
    val ranks = stats
      .select(col("g"), col("n"), explode(pArr).as("p"))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .select(col("g"), col("p"), col("pos"),
        explode(array_distinct(array(
          (floor(col("pos")) + 1).cast("bigint"),
          (ceil(col("pos")) + 1).cast("bigint")))).as("k"))

    val kth = kthValues(base, stats, ranks)

    // bracket the two order statistics back onto one (g, p) row
    kth.groupBy(col("g"), col("p"), col("pos"))
      .agg(min_by(col("v"), col("k")).as("v_lo"), max_by(col("v"), col("k")).as("v_hi"))
  }

  /** Passes 2–3 for an arbitrary rank frame (g, p, pos, k): histogram
    * narrowing then exact in-bin selection. Returns (g, p, pos, k, v). */
  private def kthValues(base: DataFrame, stats: DataFrame,
                        ranks: DataFrame): DataFrame = {
    // shared bin decision: equi-width over the per-group [lo, hi] span.
    // Pure Spark-internal arithmetic — the oracle only sees final VALUES,
    // so no cross-engine libm discipline is needed here (unlike the
    // QuantileSketch edge table); what matters is that pass 2 and pass 3
    // assign every row the SAME bin, which re-using this one expression
    // guarantees.
    def binOf(x: org.apache.spark.sql.Column) =
      when(col("hi") === col("lo"), lit(1L))
        .otherwise(least(greatest(
          (floor((x - col("lo")) * Bins / (col("hi") - col("lo"))) + 1).cast("bigint"),
          lit(1L)), lit(Bins.toLong)))

    // pass 2: per-(group, bin) counts; running sum over a group's <= 256
    // bins locates each rank's bin + the cumulative count before it
    val binned = base.join(broadcast(stats), "g")
      .select(col("g"), binOf(col("x")).as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("g")).orderBy(col("bin"))))
      .withColumn("before", col("cum") - col("cnt"))

    // candidate bins: the first bin whose cumulative count reaches k
    // (min_by keeps the bin AND its before-count in one reduction)
    val candidates = ranks.join(binned, Seq("g"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("g"), col("p"), col("pos"), col("k"))
      .agg(min(col("bin")).as("bin"),
        min_by(col("before"), col("bin")).as("before"))

    // pass 3: only rows landing in a candidate (group, bin) survive the
    // scan (broadcast semi-join on an O(groups x percentiles) frame);
    // reduce to distinct-value counts, then a running sum over the
    // distinct values INSIDE one (group, bin) — O(distinct-in-bin) rows
    // per window partition — reads off the k-th smallest exactly
    val candBins = candidates.select(col("g"), col("bin")).distinct()
    val inBin = base.join(broadcast(stats), "g")
      .select(col("g"), col("x"), binOf(col("x")).as("bin"))
      .join(broadcast(candBins), Seq("g", "bin"), "left_semi")
      .groupBy(col("g"), col("bin"), col("x")).agg(count(lit(1)).as("vcnt"))
      .withColumn("vcum", sum(col("vcnt"))
        .over(Window.partitionBy(col("g"), col("bin")).orderBy(col("x"))))

    candidates.join(inBin, Seq("g", "bin"))
      .filter(col("before") + col("vcum") >= col("k"))
      .groupBy(col("g"), col("p"), col("pos"), col("k"))
      .agg(min(col("x")).as("v"))
  }

  /** Exact continuous percentiles of `base` (columns g, x) at `ps`,
    * emitted as one row per group with columns named p<100p> (p50,
    * p90, ...). Bit-identical to `percentile(x, p)` per group. */
  def percentiles(base: DataFrame, ps: Seq[Double]): DataFrame = {
    def name(p: Double): String = {
      val v = p * 100
      if (v == math.rint(v)) s"p${v.toLong}" else s"p$v"
    }
    val brackets = bracketValues(base, ps)
      // Spark's Percentile.getPercentile, verbatim in column form
      .withColumn("value",
        when(ceil(col("pos")) === floor(col("pos")), col("v_lo"))
          .otherwise((ceil(col("pos")) - col("pos")) * col("v_lo") +
            (col("pos") - floor(col("pos"))) * col("v_hi")))
    brackets.groupBy(col("g"))
      .pivot("p", ps)
      .agg(first(col("value")))
      .select(col("g") +: ps.map(p => col(s"`$p`").as(name(p))): _*)
  }

  /** Exact DISCRETE percentiles (ANSI PERCENTILE_DISC: the smallest
    * actual value whose cumulative distribution ≥ p, i.e. the order
    * statistic at rank max(1, ceil(p·n))) — same three bounded passes,
    * no interpolation, the result is always a value present in the
    * group. Columns named pd<100p> (pd50, pd95, ...).
    *
    * The rank is computed in EXACT integer arithmetic: p is snapped to
    * the rational round(p·1e6)/1e6 and k = ceil(p_num·n / 1e6) via
    * integer ceiling division — a double `ceil(p * n)` is off by one
    * whenever p·n is an integer the product rounds just past (e.g.
    * 0.07 × 100 = 7.000000000000001 → rank 8, where ANSI and DuckDB's
    * exact-decimal quantile_disc say 7). Sound for percentiles with ≤ 6
    * decimals and groups up to ~9e12 rows (p_num·n < 2^63). */
  /** GLOBAL (single-group) exact discrete percentiles, returned as driver
    * VALUES — for callers that label a corpus against corpus-wide cuts
    * (t24's tertiles, t25's selection threshold): the cuts become plan
    * literals, so the labeling projection needs no cut join at all.
    *
    * Same three bounded passes as [[percentilesDisc]] with the per-group
    * machinery specialized away; every driver materialization is BOUNDED
    * BY A CONSTANT, never by row count (the audited-collect discipline):
    * pass 1 collects ONE stats row, pass 2 collects the ≤ 256-bin
    * histogram, pass 3 reduces to one `min` per requested percentile
    * inside one job. Rank arithmetic and in-bin selection replicate
    * [[percentilesDisc]] expression-for-expression (the exact integer
    * rank, the shared equi-width bin formula with lo/hi folded to
    * literals), so the values are bit-identical to the DataFrame form. */
  def percentilesDiscGlobal(base: DataFrame, ps: Seq[Double]): Seq[Double] = {
    val statsRow = base
      .agg(count(col("x")).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
      .head()
    val n = statsRow.getLong(0)
    if (n == 0L) return ps.map(_ => Double.NaN)
    val lo = statsRow.getDouble(1)
    val hi = statsRow.getDouble(2)
    // exact integer rank per percentile — percentilesDisc's formula
    // verbatim: k = max(1, ceil(round(p·1e6)·n / 1e6)) via integer
    // ceiling division (positive operands, so SQL div == Scala /)
    val ks = ps.map(p => math.max(1L, (math.round(p * 1000000L) * n + 999999L) / 1000000L))
    // the kernel's shared bin expression with the group's lo/hi as
    // literals (constant-folded to the identical IEEE arithmetic)
    def binOf(x: org.apache.spark.sql.Column) =
      if (hi == lo) lit(1L)
      else least(greatest(
        (floor((x - lit(lo)) * Bins / (lit(hi) - lit(lo))) + 1).cast("bigint"),
        lit(1L)), lit(Bins.toLong))
    // pass 2: ≤ Bins histogram rows; cumulate locally
    val bins = base.select(binOf(col("x")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val cumBins = bins.map { case (b, c) => val before = cum; cum += c; (b, before, cum) }
    val cand = ks.map(k => (k, cumBins.find(_._3 >= k).get))
    val candBinSet = cand.map(_._2._1).distinct
    // pass 3: distinct-value counts inside the candidate bins, running sum
    // per bin, then ONE aggregation row carrying min-above-rank per k
    val vcum = base.select(col("x"), binOf(col("x")).as("bin"))
      .filter(col("bin").isin(candBinSet.map(Long.box): _*))
      .groupBy(col("bin"), col("x")).agg(count(lit(1)).as("vcnt"))
      .withColumn("vcum", sum(col("vcnt"))
        .over(Window.partitionBy(col("bin")).orderBy(col("x"))))
    val aggs = cand.zipWithIndex.map { case ((k, (b, before, _)), i) =>
      min(when(col("bin") === lit(b) && (lit(before) + col("vcum")) >= lit(k),
        col("x"))).as(s"v$i")
    }
    val row = vcum.agg(aggs.head, aggs.tail: _*).head()
    ps.indices.map(row.getDouble)
  }

  def percentilesDisc(base: DataFrame, ps: Seq[Double]): DataFrame = {
    def name(p: Double): String = {
      val v = p * 100
      if (v == math.rint(v)) s"pd${v.toLong}" else s"pd$v"
    }
    val stats = groupStats(base)
    val pStructs = array(ps.map(p =>
      struct(lit(p).as("p"), lit(math.round(p * 1000000L)).as("pn"))): _*)
    val ranks = stats
      .select(col("g"), col("n"), explode(pStructs).as("ps"))
      .select(col("g"), col("ps.p").as("p"), lit(0.0).as("pos"),
        greatest(lit(1L),
          expr("(ps.pn * n + 999999L) div 1000000L")).as("k"))
    kthValues(base, stats, ranks)
      .groupBy(col("g"))
      .pivot("p", ps)
      .agg(first(col("v")))
      .select(col("g") +: ps.map(p => col(s"`$p`").as(name(p))): _*)
  }
}
