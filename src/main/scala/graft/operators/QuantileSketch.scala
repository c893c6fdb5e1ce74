package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable histogram quantile sketch — the re-aggregatable percentile
 * family (Presto's qdigest_agg + merge(...)): each leaf group reduces to
 * an O(Bins)-row histogram; the rollup level merges the SKETCHES
 * (bin-count addition over already-reduced rows), never re-touching the
 * corpus — the two-level topology a 100 TB percentile rollup actually
 * runs. Two deterministic binning regimes, chosen by the global bounds
 * (replayable: the oracle sees the same lo):
 *   - strictly positive domain (lo > 0): LOG-SCALED bins — each bin
 *     spans a constant factor (hi/lo)^(1/Bins), so the error is
 *     RELATIVE (≤ 5.6% per bin at hi/lo = 10^6) and p99 stays tight on
 *     heavy-tailed price/latency-like distributions where equi-width
 *     bins would lump 99% of the mass into bin 1 (the qdigest
 *     property this sketch exists to match);
 *   - otherwise: equi-width bins, error ≤ one absolute bin width.
 * Quantiles read off the merged CDF at the bin's lower edge.
 * Deterministic by construction (explicit floor binning, bounded CDF
 * windows), therefore hash-verifiable cross-engine — unlike
 * engine-defined digest sketches.
 *
 * Kernel input is a frame with columns (g1, g2, x:double); q115 maps the
 * lineitem columns in and renames the report out.
 */
object QuantileSketch {

  /** Sketch resolution — a CONSTANT of the sketch (its size/accuracy
    * trade), never a function of row count. */
  private[graft] val Bins = 256

  /** (level, g1, g2, n, p50, p95, p99): leaf = per-(g1, g2) sketch,
    * merged = per-g1 union of its leaf sketches. */
  private[graft] def report(base: DataFrame): DataFrame = {
    val bounds = base.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    // explicit floor binning (not builtin width_bucket — its internal op
    // order is engine-specific; this exact formula replays anywhere);
    // a constant column (hi = lo) degenerates to bin 1, not NaN
    val linBin = least(
      floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / Bins)) + 1,
      lit(Bins.toLong))
    val logBin = least(
      floor((log(col("x")) - log(col("lo"))) /
        ((log(col("hi")) - log(col("lo"))) / Bins)) + 1,
      lit(Bins.toLong))
    val leafHist = base.crossJoin(broadcast(bounds))
      .select(col("g1"), col("g2"),
        when(col("hi") === col("lo"), lit(1L))
          .when(col("lo") > 0, logBin)
          .otherwise(linBin).as("bin"))
      .groupBy(col("g1"), col("g2"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      // materialize the leaf sketch (≤ groups·bins rows) so the merged
      // level provably aggregates sketch rows, not a corpus re-scan —
      // the p05 localCheckpoint discipline
      .localCheckpoint()
    val mergedHist = leafHist
      .groupBy(col("g1"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("g1"), lit("ALL").as("g2"), col("bin"), col("cnt"))

    def quantiles(h: DataFrame, level: String): DataFrame = {
      val grp = Seq(col("g1"), col("g2"))
      val cum = h
        .withColumn("cum", sum(col("cnt"))
          .over(Window.partitionBy(grp: _*).orderBy(col("bin"))))
        .withColumn("total", sum(col("cnt"))
          .over(Window.partitionBy(grp: _*)))
      def pick(p: Double) =
        min(when(col("cum") >= ceil(col("total") * lit(p)), col("bin")))
      cum.groupBy(grp: _*)
        .agg(max(col("total")).as("n"),
          pick(0.5).as("b50"), pick(0.95).as("b95"), pick(0.99).as("b99"))
        .select(lit(level).as("level"), col("g1"), col("g2"), col("n"),
          col("b50"), col("b95"), col("b99"))
    }

    def edge(b: String) =
      round(
        when(col("lo") > 0,
          exp(log(col("lo")) +
            (col(b) - lit(1)).cast("double") * (log(col("hi")) - log(col("lo"))) / Bins))
        .otherwise(col("lo") +
          (col(b) - lit(1)).cast("double") * (col("hi") - col("lo")) / Bins), 4)
    quantiles(leafHist, "leaf").unionByName(quantiles(mergedHist, "merged"))
      .crossJoin(broadcast(bounds))
      .select(col("level"), col("g1"), col("g2"), col("n"),
        edge("b50").as("p50"), edge("b95").as("p95"), edge("b99").as("p99"))
      .orderBy(col("level"), col("g1"), col("g2"))
  }
}
