package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Event-stream analytics, batch form. The same logical shapes run through
 * Structured Streaming (see graft.streaming.EventPipelines and
 * StreamingSpec); these batch versions are the oracle-verified semantics.
 */
object Events {

  /** e01: tumbling 1-hour window aggregation (time-bucketed rollup). */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_events"), col("total_value"), col("n_users"))
      .orderBy(col("hour_start"))

  /** e02: sessionization — 30-minute inactivity gap splits sessions.
    * Gap detection via lag + running sum; at scale this is one shuffle on
    * user_id and a sorted window per user (no cross-user state). */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
    val newSess = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1).otherwise(0)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), newSess.as("new_sess"))
      .select(col("user_id"),
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("sess_id"))
      .groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** e04: moving average over a bounded ROWS frame (last 4 events/user). */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("value"),
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double").as("mov_sum"),
        count(lit(1)).over(w).as("mov_n"))
      .withColumn("mov_avg", col("mov_sum") / col("mov_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** e06: sliding (hopping) window aggregation — 1-hour windows advancing
    * every 15 minutes, so each event contributes to 4 overlapping windows.
    * Spark expands the event to its covering windows (a bounded 4x narrow
    * fan-out), then it's an ordinary hash aggregation — the same shape
    * runs under Structured Streaming with a watermark. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("window_start"))

  /** e07: NATIVE session windows — the same 30-minute-gap sessionization
    * as e02, but through Spark's session_window() operator (merging
    * windows inside the aggregation) instead of the lag+cumsum idiom.
    * Emits one row per session with its span and size; session end is
    * last event + gap by definition. Same shape runs under Structured
    * Streaming with a watermark. */
  def sessionWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("session_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** e03: per-event-type top-5 users by summed value (window top-k). */
  def topkUsers(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total").desc, col("user_id"))
    agg.select(col("event_type"), col("user_id"), col("total"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .orderBy(col("event_type"), col("rn"))
  }

  /** e05: ordered funnel — signup, then a view strictly after the signup,
    * then a purchase strictly after that view, per user. One conditional
    * aggregation computes the user's first signup; each later stage is a
    * conditional min against the previous stage's timestamp, so the whole
    * funnel is TWO hash shuffles on user_id (agg + self-join per stage
    * collapses: stage columns are derived in one grouped pass over a
    * (user, first_signup)-joined frame). Stage counts and conversion
    * rates out — the standard product-analytics query Presto serves. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    // one pass over signup-tagged events derives both later stages: the
    // first view after signup, then the first purchase after that view
    val staged = ev.join(signup, Seq("user_id"))
      .groupBy(col("user_id"), col("s_ts"))
      .agg(min(when(col("event_type") === "view" && col("ts") > col("s_ts"),
        col("ts"))).as("v_ts"))
    val completed = staged.filter(col("v_ts").isNotNull)
      .join(ev.filter(col("event_type") === "purchase"), Seq("user_id"))
      .filter(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    // one row of stage counts, unpivoted to the funnel report — a single
    // declarative plan, no driver-side actions
    staged.join(completed, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_signup"),
        count(col("v_ts")).as("n_view"),
        count(col("p_ts")).as("n_purch"))
      .select(explode(array(
        struct(lit("1_signup").as("stage"),
          col("n_signup").as("n_users"), lit(1.0).as("conv_from_signup")),
        struct(lit("2_view_after_signup").as("stage"),
          col("n_view").as("n_users"),
          round(col("n_view").cast("double") / col("n_signup"), 4).as("conv_from_signup")),
        struct(lit("3_purchase_after_view").as("stage"),
          col("n_purch").as("n_users"),
          round(col("n_purch").cast("double") / col("n_signup"), 4).as("conv_from_signup"))))
        .as("r"))
      .select(col("r.stage"), col("r.n_users"), col("r.conv_from_signup"))
      .orderBy(col("stage"))
  }

  /** e08: weekly cohort retention — the classic product-analytics matrix
    * Presto serves. Cohort = ISO week of a user's first purchase; cell
    * (cohort, k) = distinct users of that cohort purchasing again k weeks
    * later. Two hash shuffles total (first-purchase agg on user_id, then
    * the cohort×k distinct-count) plus one equi-join of the events frame
    * to the per-user cohort dim — at corpus scale the dim is orders of
    * magnitude smaller than the fact and broadcasts; nothing here is
    * driver-side or partition-order-dependent. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val cohorts = purchases
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    purchases.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (datediff(date_trunc("week", col("ts")), col("cohort_week")) / lit(7))
          .cast("int").as("week_k"))
      .groupBy(col("cohort_week"), col("week_k"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_k"), col("n_active"))
      .orderBy(col("cohort_week"), col("week_k"))
  }

  /** e09: rate-anomaly detection — per event type, the 5 most anomalous
    * hours by |z-score| of the hourly event count against that type's own
    * hourly distribution. The monitoring query behind every ops dashboard
    * ("did errors spike?"). Two small aggregations (hourly rollup, then a
    * per-type moment rollup joined back — at scale the per-type stats are
    * a broadcast dim) and a top-k window over the hourly frame. Moments
    * accumulate in decimal, so mean/std — and therefore the z ranking —
    * are partition-order independent; std uses the n−1 sample form. */
  def anomaly(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"),
        sum(col("n").cast(DecimalType(18, 2))).cast("double").as("sn"),
        sum((col("n") * col("n")).cast(DecimalType(28, 2))).cast("double").as("snn"))
      .select(col("event_type"), (col("sn") / col("k")).as("mean"),
        sqrt((col("snn") - col("sn") * col("sn") / col("k")) / (col("k") - 1))
          .as("std"))
    val z = (col("n") - col("mean")) / col("std")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("z")).desc, col("hour"))
    hourly.join(stats, Seq("event_type"))
      .select(col("event_type"), col("hour"), col("n"), z.as("z"))
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n"), round(col("z"), 4).as("z"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .orderBy(col("event_type"), col("rn"))
  }

  /** e11: event-type transition matrix (first-order Markov) — the
    * sequence statistic behind session modeling and bot detection: for
    * every consecutive (prev → next) event pair per user, the count and
    * row-normalized probability. One user_id shuffle for the lag window,
    * then a types²-bounded aggregate; the per-from normalization runs as a
    * window over the ≤|types|² aggregate frame, never over events.
    * Ordering pinned to (µs epoch, event_id) like e10. */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(byUser).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
    counts
      .withColumn("total", sum(col("n")).over(wFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** e10: last-touch attribution — each purchase credited to the user's
    * most recent PRECEDING click/view (the marketing-attribution join
    * Presto serves daily). One shuffle on user_id, then a running
    * `last(..., ignoreNulls)` over an unbounded-preceding-to-previous-row
    * frame — no self-join, no per-user collect; the same frame yields the
    * touch id, type, and timestamp consistently (they null out together).
    * Ordering is pinned to (microsecond ts, event_id) — the exact key the
    * oracle replays — so nanosecond source precision cannot fork ranks. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    def lastTouch(c: org.apache.spark.sql.Column) =
      last(when(isTouch, c), ignoreNulls = true).over(w)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        lastTouch(col("event_id")).as("touch_id"),
        lastTouch(col("event_type")).as("touch_type"),
        lastTouch(unix_micros(col("ts"))).as("touch_us"))
      .filter(col("event_type") === "purchase" && col("touch_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("touch_id"), col("touch_type"),
        (unix_micros(col("ts")) - col("touch_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** e13: RFM user segmentation — the recency/frequency/monetary
    * quartile scoring behind every retention/marketing analytics stack.
    * Scale design: one user_id shuffle builds the per-user frame
    * (localCheckpointed so the threshold passes aggregate IT, not
    * re-scans of events — the p05 discipline); the quartile thresholds
    * come from the q115 histogram-sketch shape — per-metric 256-bin
    * histogram, bounded-CDF window over ≤ 3·256 rows, bin-lower-edge
    * pick — NOT exact `percentile`, whose final buffer holds every
    * per-user value in one reducer (the per-executor OOM at a
    * billion-user table), and NOT ntile's global single-task sort.
    * Scoring is a comparison against the 1-row broadcast thresholds.
    * Monetary is sign-aware half-away-from-zero cents
    * (floor(abs·100+.5)·signum — a refund of -1.005 rounds to -101,
    * not -100). Deterministic by construction (explicit floor binning,
    * identical IEEE754 edge formula both engines), so still
    * hash-verifiable. Report: user counts per (r, f, m) cell + segment
    * label. */
  def rfm(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          (floor(abs(col("value")) * 100 + lit(0.5)) * signum(col("value")))
            .cast("long")).otherwise(0L))
          .as("cents"))
      .transform(graft.plans.Checkpoints.stage)
    val metrics = users.select(expr(
      """stack(3, 'r', CAST(last_us AS DOUBLE), 'f', CAST(n_events AS DOUBLE),
        |'m', CAST(cents AS DOUBLE)) AS (metric, x)""".stripMargin))
    val bounds = metrics.groupBy(col("metric"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val hist = metrics.join(broadcast(bounds), "metric")
      .select(col("metric"),
        when(col("hi") === col("lo"), lit(1L))
          .otherwise(least(
            floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / 256)) + 1,
            lit(256L))).as("bin"))
      .groupBy(col("metric"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy(col("metric")).orderBy(col("bin"))))
      .withColumn("total", sum(col("cnt"))
        .over(Window.partitionBy(col("metric"))))
    def pick(p: Double) =
      min(when(col("cum") >= ceil(col("total") * lit(p)), col("bin")))
    def edge(b: String) =
      col("lo") + (col(b) - lit(1)).cast("double") * (col("hi") - col("lo")) / 256
    val thr = cum.groupBy(col("metric"))
      .agg(pick(0.25).as("b25"), pick(0.5).as("b50"), pick(0.75).as("b75"))
      .join(bounds, "metric")
      .select(col("metric"),
        edge("b25").as("t25"), edge("b50").as("t50"), edge("b75").as("t75"))
    def t(m: String, c: String) = max(when(col("metric") === m, col(c)))
    val thresholds = thr.agg(
      t("r", "t25").as("r25"), t("r", "t50").as("r50"), t("r", "t75").as("r75"),
      t("f", "t25").as("f25"), t("f", "t50").as("f50"), t("f", "t75").as("f75"),
      t("m", "t25").as("m25"), t("m", "t50").as("m50"), t("m", "t75").as("m75"))
    def score(c: Column, q25: String, q50: String, q75: String): Column =
      lit(1) + when(c > col(q25), 1).otherwise(0) +
        when(c > col(q50), 1).otherwise(0) +
        when(c > col(q75), 1).otherwise(0)
    users.crossJoin(broadcast(thresholds))
      .select(
        score(col("last_us"), "r25", "r50", "r75").as("r_score"),
        score(col("n_events"), "f25", "f50", "f75").as("f_score"),
        score(col("cents"), "m25", "m50", "m75").as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("r_score"), col("f_score"), col("m_score"),
        when(col("r_score") >= 3 && col("f_score") >= 3 &&
          col("m_score") >= 3, "champion")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("r_score") >= 3 && col("f_score") <= 2, "fresh")
          .otherwise("casual").as("segment"),
        col("n_users"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** e12: inter-event-gap latency percentiles via the mergeable histogram
    * sketch — the p95-latency monitor every event pipeline runs, reusing
    * the [[QuantileSketch]] kernel verbatim: leaf = per-(type, day)
    * sketch, merged = per-type rollup across days by bin-count addition
    * (the sketch-merge op — daily sketches roll into weekly/monthly
    * without re-touching events). Gaps are consecutive same-user deltas
    * in exact integer microseconds (pinned to the (µs, event_id) order
    * the e10 oracle replays) scaled to seconds; one user_id shuffle for
    * the lag window, then everything runs on sketch-sized frames. */
  def gapSketch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val base = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type").as("g1"),
        date_format(col("ts"), "yyyy-MM-dd").as("g2"),
        ((unix_micros(col("ts")) - col("prev_us")).cast("double") /
          1000000.0).as("x"))
    QuantileSketch.report(base)
      .select(col("level"), col("g1").as("event_type"), col("g2").as("day"),
        col("n"), col("p50"), col("p95"), col("p99"))
  }

  /**
   * e14: EXACT sliding-window distinct users — trailing-7-day active
   * users per day, the metric naive plans get catastrophically wrong at
   * scale (a per-day self-join of raw events, or a distinct inside a
   * RANGE window, rebuilds the full set per window).
   *
   * The scalable exact topology: reduce events to distinct (day, user)
   * ONCE (the big shuffle, map-side partial), then replicate each pair
   * to the ≤7 window-end days it can serve — a bounded ×7 explode of
   * the already-reduced frame, NOT of raw events — and per-end-day
   * distinct-count. Window ends past the last observed day are
   * suppressed (partial futures), via a 1-row max-day broadcast;
   * leading partial windows (the first six ends, whose trailing-7-day
   * span predates the data) are intentionally KEPT — the standard
   * trailing-metric convention, where early windows simply see fewer
   * days — so the suppression is deliberately asymmetric. The
   * approximate path at larger windows is s10's mergeable HLL per day +
   * 7-sketch union; this entry is the exact reference beside it (the
   * q10/q115 pairing discipline).
   */
  def slidingDistinct(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = days.agg(max(col("day")).as("max_day"))
    days
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wend"))
      .crossJoin(broadcast(maxDay))
      .filter(col("wend") <= col("max_day"))
      .groupBy(col("wend"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(date_format(col("wend"), "yyyy-MM-dd").as("window_end"),
        col("active_users"))
      .orderBy(col("window_end"))
  }

  /** e20: DAU / WAU / MAU + stickiness — the canonical engagement rollup
    * (DAU/MAU is THE product-health ratio), generalizing e14's exact
    * sliding-distinct topology to the 1/7/28-day windows: events reduce
    * to distinct (day, user) ONCE, each pair replicates to its window-
    * serviceable end days (a bounded ×1/×7/×28 explode of the already-
    * reduced frame — never of raw events), per-end-day distinct counts
    * with map-side partials, partial FUTURE windows suppressed via the
    * 1-row max-day broadcast (partial lookback at the corpus start is
    * the metric's standard semantics). The MAU frame's end-day set is a
    * superset of WAU's and DAU's by construction (a window ending at an
    * activity day exists in every wider window), so the report LEFT
    * joins from MAU and 0-fills; stickiness is EXACT integer basis
    * points (`10000·dau div mau` — mau ≥ 1 on every emitted row).
    * The approximate scale path at bigger windows is s10's mergeable
    * HLL union; this is the exact reference beside it (the e14
    * pairing discipline). */
  def stickiness(s: SparkSession, d: String): DataFrame = {
    // Deliberately NOT staged — the r15 staging audit's measured
    // counter-example (the d16 class): the (user_id, day) distinct frame
    // has FOUR consumers, but on this data it is 40% of the event log
    // (401k user-days per 1M events at sf1.0), so materializing it costs
    // more than the re-scans it saves — staged measured 1.32 s vs 1.02 s
    // unstaged at sf1.0. The slim-multi-consumer rubric requires the
    // shared frame to be much smaller than its source; a clickstream
    // with many events per user-day crosses that threshold and would
    // flip this to Checkpoints.stage — the condition, not the site, is
    // the rule.
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = days.agg(max(col("day")).as("max_day"))
    def actives(window: Int, name: String) = days
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), window - 1))).as("wend"))
      .crossJoin(broadcast(maxDay))
      .filter(col("wend") <= col("max_day"))
      .groupBy(col("wend")).agg(countDistinct(col("user_id")).as(name))
    actives(28, "mau")
      .join(actives(7, "wau"), Seq("wend"), "left")
      .join(actives(1, "dau"), Seq("wend"), "left")
      .select(date_format(col("wend"), "yyyy-MM-dd").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        col("mau"))
      .withColumn("stickiness_bp", expr("(10000 * dau) div mau"))
      .orderBy(col("day"))
  }

  /** e15: conversion-lag distribution — the time-to-convert report product
    * analytics pairs with the e05 funnel (how MANY convert) to answer how
    * FAST they convert. Cohort = calendar day of a user's first view;
    * per cohort: viewer/converter counts, conversion rate, and the exact
    * median and p90 of the first-view→first-purchase lag. Lags are kept
    * in integer MICROSECONDS end to end (unix_micros both sides), so the
    * percentile values are exact integers and no double-rounding seam
    * exists; the cuts come from the shared exact-selection kernel
    * ([[ExactSelection.percentilesDisc]] — three bounded passes per
    * group, never an all-values buffer), the same discipline as q10/q137.
    *
    * Scale: two user-keyed aggregations (first view, first purchase
    * after it) + one day-keyed count — all map-side combined; the
    * percentile kernel shuffles (day, bin) frames bounded by 256 bins
    * per cohort day. Nothing driver-side, nothing quadratic. */
  def conversionLag(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val firstPurch = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    // Staged (localCheckpoint): the counts aggregate plus ExactSelection's
    // three bounded percentile passes all consume this frame — unstaged,
    // each one recomputed the full first-view/first-purchase staging from
    // the events scan (r14 manifest: 27 scans / 40 exchanges, the t24
    // pattern). Slim frame: (user_id, day, lag_us).
    val lags = graft.plans.Checkpoints.stage(firstView
      .join(firstPurch, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        date_format(col("v_ts"), "yyyy-MM-dd").as("day"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us")))
    val counts = lags.groupBy(col("day"))
      .agg(count(lit(1)).as("n_viewers"), count(col("lag_us")).as("n_converted"))
    val cuts = ExactSelection.percentilesDisc(
        lags.filter(col("lag_us").isNotNull)
          .select(col("day").as("g"), col("lag_us").cast("double").as("x")),
        Seq(0.5, 0.9))
      .toDF("day", "pd50", "pd90")
    counts.join(cuts, Seq("day"), "left_outer")
      .select(col("day"), col("n_viewers"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_viewers"), 4).as("conv_rate"),
        col("pd50").cast("long").as("med_lag_us"),
        col("pd90").cast("long").as("p90_lag_us"))
      .orderBy(col("day"))
  }

  /** e16: per-event-type dwell time — how long a user LINGERS on each
    * action before their next event, the engagement signal session
    * counts (e02) and funnels (e05) both miss. Dwell = time to the
    * user's next event, counted only when it lands inside the e02
    * session gap (30 min); a longer gap is a session END for that
    * type, reported beside the dwells. EXACT integer microseconds
    * everywhere: the sum/max/count are BIGINT aggregates and the mean
    * is a floor DIVISION of exact integers (`sum div n`), never a
    * double — both engines floor identically, so no rounding fork
    * exists (§5 discipline; the trailing-division trap that bit t24).
    * Scale: one user-keyed window sort (the lead), then a map-side
    * combined aggregate on event_type — the type cardinality is tiny,
    * so the final exchange is a handful of 40-byte rows; ties on ts
    * break by event_id so the lead is deterministic at any SF. */
  /** e19: conversion survival curve — the cumulative time-to-convert
    * distribution beside e15's per-cohort median/p90 (e15 answers "how
    * slow is a typical cohort"; the survival curve answers "what share
    * of all converters land within k days" — the horizon question an
    * attribution window or a retargeting budget is actually set by).
    * Same first-view → first-strictly-later-purchase staging as e15,
    * lag bucketed to whole days (capped at 7 = "a week or more"),
    * cumulative counts and the cumulative share in EXACT integer basis
    * points (floor division); integer microseconds end-to-end, so no
    * rounding seam exists anywhere. Scale: two user-keyed aggs (map-
    * side combined) and one ≤8-row bucket frame — both global windows
    * run over that bounded frame, never the corpus. */
  def conversionSurvival(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val firstPurch = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    val counts = firstView.join(firstPurch, Seq("user_id"))
      .select(least(
        expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 86400000000"),
        lit(7L)).as("lag_day"))
      .groupBy(col("lag_day")).agg(count(lit(1)).as("n"))
    val cum = Window.orderBy(col("lag_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("cum_bp", expr("(10000 * cum_n) div sum(n) over ()"))
      .orderBy(col("lag_day"))
  }

  /** e18: session path mining — the top 3-step event-type paths users
    * actually walk (e11's transition matrix is the 2-step memoryless
    * view; product analytics asks for the longer motifs — "view →
    * click → purchase vs view → click → view"). Two (ts, event_id)-
    * ordered leads per user produce each length-3 window; a path counts
    * only when BOTH consecutive gaps sit inside the e02 session gap
    * (30 min) so cross-session seams never fabricate paths; counts are
    * exact integers and the share is EXACT integer basis points over
    * the path total (floor division — the e16 discipline). Scale: one
    * user-keyed window sort, then a map-side-combined aggregate onto
    * the ≤|types|³ path key space — the final frame is bounded by the
    * type vocabulary, not the corpus; the share window runs over that
    * tiny frame. */
  def pathMining(s: SparkSession, d: String): DataFrame = {
    val sessUs = 1800L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val paths = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("t2", lead(col("event_type"), 1).over(byUser))
      .withColumn("t3", lead(col("event_type"), 2).over(byUser))
      .withColumn("g1", lead(col("us"), 1).over(byUser) - col("us"))
      .withColumn("g2", lead(col("us"), 2).over(byUser) - lead(col("us"), 1).over(byUser))
      .filter(col("t3").isNotNull && col("g1") <= sessUs && col("g2") <= sessUs)
      .groupBy(col("event_type").as("p1"), col("t2").as("p2"), col("t3").as("p3"))
      .agg(count(lit(1)).as("n"))
    paths
      .withColumn("share_bp",
        expr("(10000 * n) div sum(n) over ()"))
      .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
  }

  /** e17: event-rate burst detection — the bot/abuse rate signal a crawl
    * or product pipeline gates ingestion on (automated clients cluster
    * far more events into a window than a human session produces). Per
    * user, the EXACT max number of events inside any trailing 24h
    * window, computed with a RANGE frame over integer microseconds
    * (`RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW` — the frame
    * boundary arithmetic is integer on both engines, and RANGE treats
    * same-timestamp peers identically, so no tie rule is even needed);
    * flagged when the max burst reaches 10 (p99 of this corpus's human
    * rate is 9). Scale: ONE user-keyed shuffle feeds both the window
    * and the per-user aggregate (the aggregate reuses the window's hash
    * partitioning — no second exchange); per-row state is the frame's
    * count, never the event list. */
  def burstDetection(s: SparkSession, d: String): DataFrame = {
    val windowUs = 24L * 3600L * 1000000L - 1L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us")).rangeBetween(-windowUs, 0)
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("burst")).as("max_burst_24h"))
      .withColumn("is_burst", col("max_burst_24h") >= 10)
      .orderBy(col("user_id"))
  }

  def dwellTime(s: SparkSession, d: String): DataFrame = {
    val sessUs = 1800L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("dwell_us",
        lead(unix_micros(col("ts")), 1).over(byUser) - unix_micros(col("ts")))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("dwell_us") <= sessUs, 1)).as("n_dwells"),
        sum(when(col("dwell_us") <= sessUs, col("dwell_us"))).as("sum_dwell_us"),
        max(when(col("dwell_us") <= sessUs, col("dwell_us"))).as("max_dwell_us"),
        count(when(col("dwell_us") > sessUs, 1)).as("n_session_ends"))
      .withColumn("avg_dwell_us", expr("sum_dwell_us div n_dwells"))
      .orderBy(col("event_type"))
  }
}
