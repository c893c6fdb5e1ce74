package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** One event row as consumed by the streaming pipelines. */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Running session state for mapGroupsWithState sessionization. */
case class SessionState(nSessions: Long, nEvents: Long, lastTsMicros: Long)
case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

/** Open-session state for flatMapGroupsWithState session flushing. */
case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)
case class ClosedSession(user_id: Long, n_events: Long, start_ms: Long, end_ms: Long)

/** One consecutive (from → to) event-type transition of a user. */
case class Transition(user_id: Long, from_type: String, to_type: String)

/** Earliest-view state for the streaming conversion pairing. */
case class PendingView(viewMs: Long)

/** One first-view → first-purchase conversion of a user. */
case class Conversion(user_id: Long, view_ms: Long, purchase_ms: Long,
                      lag_ms: Long)

/** One trailing-window event count of a user (streaming burst signal). */
case class BurstCount(user_id: Long, ts_ms: Long, burst: Long)

/** One completed in-session 3-step path of a user (streaming e18). */
case class PathTriple(user_id: Long, p1: String, p2: String, p3: String)

/**
 * Structured Streaming forms of the event analytics (batch equivalents:
 * graft.operators.Events — oracle-verified). readStream → transform →
 * writeStream; the same code runs against Kafka/files at scale by swapping
 * the source. Watermarks bound state so 100 TB/day streams don't grow
 * state unboundedly.
 */
object EventPipelines {

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark.
    * Identical logical shape to Events.tumbling. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_events"), col("total_value"), col("n_users_approx"))

  /** Stateful sessionization: per-user session counting with a 30-minute
    * gap, via mapGroupsWithState.
    *
    * `timeout` defaults to NoTimeout (deterministic micro-batch quiescence
    * — required for processAllAvailable-style tests); production streams
    * should pass ProcessingTimeTimeout so idle users' state is evicted
    * (with it, timeout sweeps keep triggering batches, which is correct
    * but never quiesces). */
  def sessionize(events: Dataset[Event],
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            val tsMicros = e.ts.getTime * 1000L
            val newSession = st.lastTsMicros == Long.MinValue ||
              tsMicros - st.lastTsMicros > 1800L * 1000000L
            st = SessionState(
              st.nSessions + (if (newSession) 1 else 0),
              st.nEvents + 1, tsMicros)
          }
          state.update(st)
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout) {
            state.setTimeoutDuration("1 hour")
          }
          SessionUpdate(userId, st.nSessions, st.nEvents)
      }
  }

  /** Stream-static enrichment join: a streaming event feed joined to a
    * (broadcastable) dimension table — the standard lookup-join topology;
    * the dim is re-read per micro-batch so slowly-changing dims stay
    * fresh without restarting the query. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"), "left")

  /** Stream-stream interval join: attribute each click to the same user's
    * views in the preceding 30 minutes. Watermarks on BOTH sides bound the
    * join state (each side buffers only rows newer than the other side's
    * watermark minus the interval) — without them state grows forever. */
  def clickAttribution(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v, expr(
      """user_id = v_user_id AND
         view_ts BETWEEN click_ts - INTERVAL 30 MINUTES AND click_ts"""))
      .select(col("user_id"), col("click_id"), col("view_id"))
  }

  /** Watermarked streaming dedup by event_id: exactly-once-shaped ingestion
    * in the face of at-least-once sources. State holds only ids within the
    * watermark horizon, so it stays bounded at any stream volume. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming URL-frontier dedup — the crawl-scheduler topology: a
    * stream of discovered (url, ts) rows canonicalizes with the d11
    * kernel ([[graft.dedup.Dedup.canonicalUrl]] — case-fold, www./port
    * strip, utm_* removal, param sort, fragment drop) and drops
    * re-discoveries of the SAME canonical URL within the watermark
    * horizon. Trackers/fragments/case jitter — the reason naive frontier
    * sets explode — collapse before the state lookup, and state holds
    * only canonical keys inside the horizon, so it stays bounded at any
    * crawl volume. */
  def urlFrontier(urls: DataFrame): DataFrame =
    urls
      .select(col("ts"), col("url"),
        graft.dedup.Dedup.canonicalUrl(col("url")).as("canonical_url"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("canonical_url")

  /** Streaming sliding-window distinct users — the streaming face of the
    * e14 batch topology ([[graft.operators.Events.slidingDistinct]]):
    * each event's (user, day) replicates to its ≤7 serviceable
    * window-end days up front (the bounded ×7 explode), then ONE
    * deduplication on (user_id, window_end) inside the watermark horizon
    * subsumes the batch plan's distinct-(day,user) reduction — a
    * duplicate (user, day) produces identical replicas, removed there —
    * and the per-window-end count finalizes in append mode when the
    * watermark passes the window end. State is (user × ≤7 window ends)
    * inside the horizon; nothing rebuilds a user set per window. */
  def slidingDistinct(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wend"))
      .select(col("user_id"), col("wend").cast("timestamp").as("wend_ts"))
      // the delay must absorb the 6-day FORWARD replication (the newest
      // event's furthest window end leads its own day by 6 days) plus
      // one day of event lateness — 7 days ⇒ watermark trails the
      // newest observed day by 1 day, so a day-late event's earliest
      // window end is still accepted
      .withWatermark("wend_ts", "7 days")
      .dropDuplicatesWithinWatermark("user_id", "wend_ts")
      .groupBy(col("wend_ts"))
      .agg(count(lit(1)).as("active_users"))

  /** Streaming mergeable histogram sketch — the streaming face of the
    * q115 quantile sketch ([[graft.operators.QuantileSketch]]): running
    * per-(event_type, bin) counts over a FIXED [lo, hi] domain. Each
    * micro-batch's partial counts merge into the running state by bin
    * addition — exactly the sketch-merge operation — so the latest rows
    * always equal the batch sketch over everything ingested (spec-pinned).
    * The domain is pinned up front: a production metric monitor knows its
    * range, and a stream cannot make the second global min/max pass the
    * batch kernel uses. Out-of-domain values clamp to the edge bins.
    * State is O(types · bins), watermark-free by design. */
  def histogramSketch(events: DataFrame, lo: Double, hi: Double,
                      bins: Int = 64): DataFrame = {
    val x = col("value").cast("double")
    val bin =
      if (hi == lo) lit(1L)
      else least(greatest(
        floor((x - lit(lo)) / ((lit(hi) - lit(lo)) / bins)) + 1, lit(1L)),
        lit(bins.toLong))
    events.select(col("event_type"), bin.as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** flatMapGroupsWithState sessionization that EMITS each session as it
    * closes (gap > 30 min), keeping only the open session in state — the
    * session-log topology (vs sessionize's running per-user counters).
    *
    * Uses EventTimeTimeout under a watermark: an idle user's trailing open
    * session is flushed (and its state evicted) once the watermark passes
    * session end + gap, so state stays bounded and no session is withheld
    * forever waiting for a next event that never comes. */
  def sessionFlush(events: Dataset[Event], watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap with no further events: the open
            // session can never be extended — emit it and drop the state
            val o = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, o.nEvents, o.startMs, o.lastMs))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(o) if t - o.lastMs > gapMs =>
                  closed += ClosedSession(userId, o.nEvents, o.startMs, o.lastMs)
                  open = Some(OpenSession(t, t, 1))
                case Some(o) =>
                  open = Some(OpenSession(o.startMs, t, o.nEvents + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // timeout may not be set behind the watermark (late data can
              // land a session end there) — clamp forward in that case
              state.setTimeoutTimestamp(
                math.max(o.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Streaming form of the e15 conversion staging (batch:
    * Events.conversionLag's firstView ⋈ firstPurchase): per user, hold
    * the EARLIEST view seen and emit one Conversion when the first
    * strictly-later purchase arrives — then drop the state immediately
    * (a converted user needs nothing further). Non-converters are the
    * state-growth hazard of an attribution stream: every viewer who
    * never buys would sit in state forever, so the pairing carries a
    * conversion HORIZON — an event-time timeout at view + horizon
    * evicts the pending view once the watermark proves no in-horizon
    * purchase can still arrive. State is therefore bounded by the
    * viewers INSIDE one horizon window, not by stream history — the
    * shape that survives a 100 TB/day event feed.
    *
    * Semantics vs batch: identical staging restricted to conversions
    * within the horizon (batch has no horizon — it can see all of
    * history at once; the restriction is the price of bounded state and
    * is explicit in the API). Purchases with no prior view hold no
    * state; a post-eviction purchase emits nothing (spec-pinned — the
    * eviction is observable, not just an internals claim). The horizon
    * is enforced at EMISSION too, not only via the timeout: a purchase
    * whose lag exceeds the horizon never pairs — it evicts the pending
    * view in place (the view provably expired unconverted), so output
    * does not depend on whether the timeout or the purchase reaches the
    * operator first (batch boundaries, other users' watermark progress).
    * Exact under per-user event-time-ordered arrival, the same
    * lag-shape contract as [[transitionPairs]]. */
  def conversionPairs(events: Dataset[Event], watermark: String = "1 hour",
      horizonMs: Long = 24L * 3600 * 1000): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingView, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[PendingView]) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed with no purchase: non-converter
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var pending = state.getOption
            var emitted: Option[Conversion] = None
            sorted.foreach { e =>
              if (emitted.isEmpty) e.event_type match {
                case "view" =>
                  if (pending.forall(_.viewMs > e.ts.getTime))
                    pending = Some(PendingView(e.ts.getTime))
                case _ => // purchase
                  pending.filter(p => e.ts.getTime > p.viewMs).foreach { p =>
                    if (e.ts.getTime - p.viewMs <= horizonMs)
                      emitted = Some(Conversion(uid, p.viewMs, e.ts.getTime,
                        e.ts.getTime - p.viewMs))
                    else
                      // over-horizon purchase: the pending view's window has
                      // provably expired unconverted — evict it HERE, not at
                      // the timeout, so eviction semantics are independent of
                      // batch boundaries / watermark progress (an in-batch
                      // over-horizon purchase must behave exactly like the
                      // timeout firing first). A later view re-arms, same as
                      // after a timeout eviction.
                      pending = None
                  }
              }
            }
            if (emitted.isDefined) {
              if (state.exists) state.remove()
              emitted.iterator
            } else {
              pending.foreach { p =>
                state.update(p)
                // timeout may not be set at/behind the watermark — clamp
                // forward (the sessionFlush late-data rule)
                state.setTimeoutTimestamp(
                  math.max(p.viewMs + horizonMs, state.getCurrentWatermarkMs() + 1))
              }
              Iterator.empty
            }
          }
      }
  }

  /** Streaming form of the e11 transition matrix (batch:
    * Events.transitions): per-user flatMapGroupsWithState keeping only the
    * LAST event type in state — O(1) state per user regardless of stream
    * volume — and emitting one Transition row per consumed event that has
    * a predecessor. Downstream aggregates (from, to) counts however it
    * likes; correctness requires per-user batch arrival in event-time
    * order, the same contract every lag-shaped streaming computation
    * carries. */
  def transitionPairs(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[String]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Transition]()
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(l => out += Transition(userId, l, e.event_type))
            last = Some(e.event_type)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming form of the e17 trailing-window burst (batch:
    * Events.burstDetection): per-user flatMapGroupsWithState whose state
    * is ONLY the ascending event timestamps inside one trailing window
    * of the newest event — O(events-per-window) per user, pruned every
    * batch, never O(history) (the rate a burst detector flags is by
    * definition bounded × window, so the state bound is the flag
    * threshold itself at worst). Emits the trailing count per consumed
    * event; downstream maxes per user. Same per-user event-time arrival
    * contract as transitionPairs; the per-user MAX agrees with the
    * batch RANGE frame even on timestamp ties, because the last peer of
    * a tied group sees the whole group. */
  def burstCounts(events: Dataset[Event],
      windowMs: Long = 24L * 3600 * 1000): Dataset[BurstCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], BurstCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[List[Long]]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          // deque, not List: timestamps arrive ascending, so the window
          // slides by appending at the tail and pruning expired entries
          // from the head — O(1) amortized per event. The immutable
          // `(buf :+ t).filter(...)` form this replaced rebuilt the whole
          // list per event: O(n²) per batch for exactly the high-rate
          // users a burst detector exists to flag.
          val buf = scala.collection.mutable.ArrayDeque.from(
            state.getOption.getOrElse(Nil))
          val out = scala.collection.mutable.ArrayBuffer[BurstCount]()
          sorted.foreach { e =>
            val t = e.ts.getTime
            buf.append(t)
            while (buf.nonEmpty && buf.head <= t - windowMs) buf.removeHead()
            out += BurstCount(uid, t, buf.length.toLong)
          }
          if (buf.nonEmpty) state.update(buf.toList) else state.remove()
          out.iterator
      }
  }

  /** Streaming form of the e18 path mining (batch: Events.pathMining):
    * per-user flatMapGroupsWithState keeping ONLY the last TWO
    * (event_type, ts) pairs — O(1) state per user regardless of stream
    * volume, the transitionPairs discipline one step longer — and
    * emitting a PathTriple for every consumed event whose two trailing
    * gaps both sit inside the session gap (a longer gap silently
    * closes the window, exactly the batch filter). Downstream counts
    * (p1, p2, p3) however it likes. Same per-user event-time arrival
    * contract as transitionPairs. */
  def pathTriples(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[PathTriple] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(String, Long)], PathTriple](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event],
         state: GroupState[List[(String, Long)]]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption.getOrElse(Nil) // ≤2, oldest first
          val out = scala.collection.mutable.ArrayBuffer[PathTriple]()
          sorted.foreach { e =>
            val t = e.ts.getTime
            last match {
              case List((p1, ts1), (p2, ts2))
                if ts2 - ts1 <= gapMs && t - ts2 <= gapMs =>
                out += PathTriple(uid, p1, p2, e.event_type)
              case _ =>
            }
            last = (last :+ (e.event_type, t)).takeRight(2)
          }
          if (last.nonEmpty) state.update(last)
          out.iterator
      }
  }

  /** Convenience: start the tumbling pipeline into an in-memory sink. */
  def startTumblingToMemory(events: DataFrame, queryName: String) =
    tumbling(events).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()

  /** The p12 delta-merge run CONTINUOUSLY — incremental view maintenance
    * as a stream: each micro-batch aggregates its OWN rows (count +
    * exact DECIMAL sum, the mergeable partials) and folds them into
    * versioned parquet state by key (read latest version → union →
    * re-reduce → write v{batchId}; versioning keeps the read and the
    * overwrite off the same files). State is rollup-sized (days ×
    * types), so each maintenance step is O(state + batch), never
    * O(history) — the same invariant the batch p12 oracle pins
    * (merge ≡ rebuild), here pinned by StreamingSpec against a
    * from-scratch aggregate over everything the stream has seen. At
    * production scale the identical foreachBatch body targets a
    * MERGE-capable table; plain parquet versions keep this
    * dependency-free. The decimal partial is re-snapped to
    * DECIMAL(28,2) after each merge so the state schema is a fixed
    * point under repeated union+sum (Spark widens summed decimals). */
  def startRollupMaintenance(events: DataFrame, stateDir: String) =
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        def reduce(df: DataFrame): DataFrame = df
          .groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).as("sum_val"))
        val delta = reduce(batch
          .select(to_date(col("ts")).as("day"), col("event_type"), col("value")))
          .select(col("day"), col("event_type"), col("n_events"),
            col("sum_val").cast("decimal(28,2)").as("sum_val"))
        val versions = Option(new java.io.File(stateDir).list())
          .map(_.toSeq.filter(_.startsWith("v")).map(_.drop(1).toLong))
          .getOrElse(Seq.empty)
        val merged =
          if (versions.isEmpty) delta
          else delta.unionByName(spark.read.parquet(s"$stateDir/v${versions.max}"))
            .groupBy(col("day"), col("event_type"))
            .agg(sum(col("n_events")).as("n_events"),
              sum(col("sum_val")).cast("decimal(28,2)").as("sum_val"))
        merged.write.mode("overwrite").parquet(s"$stateDir/v$id")
        ()
      }
      .start()
}
