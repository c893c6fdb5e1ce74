package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.streaming.{Event, EventPipelines}

class StreamingSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming tumbling window matches batch aggregation semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 10.0),
      Event(2, ts("2024-01-01 10:45:00"), 2, "view", 5.0),
      Event(3, ts("2024-01-01 11:10:00"), 1, "click", 2.5))
    val q = EventPipelines.startTumblingToMemory(input.toDF(), "tumbling_test")
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM tumbling_test ORDER BY hour_start").collect()
      assert(out.length == 2)
      assert(out(0).getAs[String]("hour_start") == "2024-01-01 10:00:00")
      assert(out(0).getAs[Long]("n_events") == 2)
      assert(math.abs(out(0).getAs[Double]("total_value") - 15.0) < 1e-9)
      assert(out(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("stream-static enrichment join looks up the dimension per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = EventPipelines.enriched(input.toDF(), dim).writeStream
      .outputMode("append").format("memory").queryName("enrich_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 9, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, tier FROM enrich_test ORDER BY user_id")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 9L -> None))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to recent views only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventPipelines.clickAttribution(clicks.toDF(), views.toDF())
      .writeStream.outputMode("append").format("memory").queryName("attr_test").start()
    try {
      views.addData(
        Event(10, ts("2024-01-01 09:45:00"), 1, "view", 1.0),  // within 30 min
        Event(11, ts("2024-01-01 08:00:00"), 1, "view", 1.0),  // too old
        Event(12, ts("2024-01-01 09:50:00"), 2, "view", 1.0))  // other user
      clicks.addData(Event(20, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, view_id FROM attr_test").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == Set((20L, 10L)))
    } finally q.stop()
  }

  test("watermarked dedup drops re-delivered event ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.dedupStream(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dedup_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      // at-least-once redelivery of event 1 in a later micro-batch
      input.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dedup_test").head().getLong(0) == 2)
    } finally q.stop()
  }

  test("streaming URL frontier collapses tracker/case/fragment variants across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = EventPipelines.urlFrontier(input.toDF().toDF("ts", "url"))
      .writeStream.outputMode("append").format("memory")
      .queryName("frontier_test").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "https://www.example.com/p/1?id=1&ref=home"),
        (ts("2024-01-01 10:00:10"), "https://other.example.com/p/2?id=2"),
        // two DISTINCT query-less pages — most real crawl URLs carry no
        // `?`; both must survive (a null-keyed canonical would collapse
        // them into one state entry and drop the second)
        (ts("2024-01-01 10:00:20"), "https://www.example.com/about"),
        (ts("2024-01-01 10:00:30"), "https://www.example.com/contact"))
      q.processAllAvailable()
      // same pages rediscovered later with tracking params, fragment,
      // default port, host-case jitter, a bare `?`, and a utm-only
      // query — all must collapse into the first sightings
      input.addData(
        (ts("2024-01-01 10:05:00"),
          "HTTPS://WWW.Example.COM:443/p/1?ref=home&utm_source=feed&id=1#frag"),
        (ts("2024-01-01 10:05:10"), "https://example.com/about?"),
        (ts("2024-01-01 10:05:20"),
          "HTTPS://example.com/contact?utm_source=feed#frag"),
        (ts("2024-01-01 10:06:00"), "https://new.example.com/p/3?id=3"))
      q.processAllAvailable()
      val urls = spark.sql("SELECT canonical_url FROM frontier_test")
        .collect().map(_.getString(0)).sorted
      assert(urls.length == 5, urls.mkString(", "))
      assert(urls.contains("https://example.com/p/1?id=1&ref=home"))
      assert(urls.contains("https://example.com/about"))
      assert(urls.contains("https://example.com/contact"))
    } finally q.stop()
  }

  test("URL frontier runs on the RocksDB state store (crawl-scale state)") {
    // the default HDFS-backed provider holds every canonical URL in an
    // on-heap map — a 100 TB crawl frontier won't fit; this pins the
    // production config (GraftSession.rocksdbStateConfs) actually
    // driving the same topology, state living in RocksDB
    implicit val sqlCtx = spark.sqlContext
    GraftSession.rocksdbStateConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[(Timestamp, String)]
      val q = EventPipelines.urlFrontier(input.toDF().toDF("ts", "url"))
        .writeStream.outputMode("append").format("memory")
        .queryName("frontier_rocks").start()
      try {
        input.addData(
          (ts("2024-01-01 10:00:00"), "https://www.example.com/a"),
          (ts("2024-01-01 10:00:10"), "https://example.com/b?id=2"))
        q.processAllAvailable()
        input.addData( // re-discoveries across a batch boundary still dedup
          (ts("2024-01-01 10:01:00"), "HTTPS://example.com/a?utm_source=x#f"),
          (ts("2024-01-01 10:01:10"), "https://www.example.com/b?id=2"))
        q.processAllAvailable()
        assert(spark.sql("SELECT count(*) FROM frontier_rocks").head().getLong(0) == 2)
        // the state operator reports RocksDB-specific metrics — proof the
        // provider swap reached the running query, not just the conf map
        val metrics = q.lastProgress.stateOperators.head.customMetrics
          .keySet().toArray.map(_.toString)
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"expected RocksDB state metrics, got: ${metrics.mkString(", ")}")
      } finally q.stop()
    } finally GraftSession.rocksdbStateConfs.keys.foreach(spark.conf.unset)
  }

  test("flatMapGroupsWithState emits sessions as they close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.sessionFlush(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("flush_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 5, "click", 1.0),
        Event(2, ts("2024-01-01 09:10:00"), 5, "click", 1.0))
      q.processAllAvailable()
      // nothing closed yet — first session still open
      assert(spark.sql("SELECT count(*) FROM flush_test").head().getLong(0) == 0)
      // a 2h-later event closes session 1 (2 events) and opens session 2
      input.addData(Event(3, ts("2024-01-01 11:30:00"), 5, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM flush_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 5L && rows.head.getLong(1) == 2L)
    } finally q.stop()
  }

  test("sessionFlush flushes an idle user's trailing session via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.sessionFlush(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("flush_timeout").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 5, "click", 1.0),
        Event(2, ts("2024-01-01 09:10:00"), 5, "click", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM flush_timeout").head().getLong(0) == 0)
      // user 5 goes idle; ANOTHER user's event drives the watermark past
      // 09:40 (last + gap), so user 5's open session must flush on timeout
      input.addData(Event(3, ts("2024-01-01 13:00:00"), 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM flush_timeout ORDER BY user_id").collect()
      assert(rows.length == 1, s"expected exactly user 5's flushed session, got ${rows.length}")
      assert(rows.head.getLong(0) == 5L && rows.head.getLong(1) == 2L)
    } finally q.stop()
  }

  test("conversionPairs: first view pairs with first later purchase across batches (e15 parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.conversionPairs(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("conv_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 1, "view", 1.0),     // u1: converts in-batch
        Event(2, ts("2024-01-01 09:30:00"), 1, "purchase", 9.0),
        Event(3, ts("2024-01-01 09:00:00"), 2, "view", 1.0),     // u2: converts next batch
        Event(4, ts("2024-01-01 08:00:00"), 4, "purchase", 9.0), // u4: purchase BEFORE any view
        Event(5, ts("2024-01-01 09:00:00"), 5, "view", 1.0),     // u5: lag from FIRST view
        Event(6, ts("2024-01-01 09:20:00"), 5, "view", 1.0))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT user_id, lag_ms FROM conv_test ORDER BY user_id").collect()
      assert(b1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1L, 30L * 60 * 1000)), s"batch 1: ${b1.mkString}")
      input.addData(
        Event(7, ts("2024-01-01 10:00:00"), 2, "purchase", 9.0),  // u2 converts
        Event(8, ts("2024-01-01 09:10:00"), 4, "view", 1.0),      // u4 view arrives
        Event(9, ts("2024-01-01 10:30:00"), 4, "purchase", 9.0),  // ... pairs with THIS one
        Event(10, ts("2024-01-01 09:40:00"), 5, "purchase", 9.0)) // u5: lag from 09:00
      q.processAllAvailable()
      val b2 = spark.sql("SELECT user_id, view_ms, lag_ms FROM conv_test ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(b2.map(_._1).toSeq == Seq(1L, 2L, 4L, 5L), b2.mkString)
      assert(b2(1)._3 == 60L * 60 * 1000)            // u2: 09:00 -> 10:00
      assert(b2(2)._3 == 80L * 60 * 1000)            // u4: 09:10 -> 10:30
      assert(b2(3)._2 == ts("2024-01-01 09:00:00").getTime &&
        b2(3)._3 == 40L * 60 * 1000)                 // u5: FIRST view wins
    } finally q.stop()
  }

  test("conversionPairs: horizon timeout evicts non-converters observably") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // short 2h horizon so eviction is reachable in-test
    val q = EventPipelines.conversionPairs(input.toDS(), horizonMs = 2L * 3600 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("conv_timeout").start()
    try {
      input.addData(Event(1, ts("2024-01-01 09:00:00"), 7, "view", 1.0))
      q.processAllAvailable()
      // another user's far-future event drives the watermark past
      // 09:00 + 2h horizon (+1h watermark delay): u7's pending view evicts
      input.addData(Event(2, ts("2024-01-01 23:00:00"), 9, "view", 1.0))
      q.processAllAvailable()
      // a purchase AFTER eviction must emit nothing — the eviction is
      // observable behavior, not an internals claim
      input.addData(Event(3, ts("2024-01-01 23:30:00"), 7, "purchase", 9.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM conv_timeout").head().getLong(0) == 0)
      // whereas an in-horizon sibling converts fine under the same driver
      input.addData(Event(4, ts("2024-01-01 23:40:00"), 9, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id FROM conv_timeout").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(9L))
    } finally q.stop()
  }

  test("conversionPairs: in-batch over-horizon purchase never pairs (emission guard)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.conversionPairs(input.toDS(), horizonMs = 2L * 3600 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("conv_guard").start()
    try {
      // ALL in one batch, so the event-time timeout cannot fire first:
      // without the emission guard u7's 3h-lag purchase would pair here
      // (the nondeterminism ADVICE r13 flagged — output depended on batch
      // boundaries). With it, the over-horizon purchase evicts the
      // pending view in place and the NEXT view re-arms.
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 7, "view", 1.0),
        Event(2, ts("2024-01-01 12:00:00"), 7, "purchase", 9.0),  // lag 3h > 2h: NO pair
        Event(3, ts("2024-01-01 12:30:00"), 7, "view", 1.0),      // re-arms post-eviction
        Event(4, ts("2024-01-01 13:00:00"), 7, "purchase", 9.0),  // pairs: lag 30m
        Event(5, ts("2024-01-01 09:00:00"), 8, "view", 1.0),      // in-horizon control
        Event(6, ts("2024-01-01 10:00:00"), 8, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, view_ms, lag_ms FROM conv_guard ORDER BY user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq(
        (7L, ts("2024-01-01 12:30:00").getTime, 30L * 60 * 1000),
        (8L, ts("2024-01-01 09:00:00").getTime, 60L * 60 * 1000)), rows.mkString(", "))
    } finally q.stop()
  }

  test("streaming rollup maintenance: versioned state equals a from-scratch rebuild (p12 parity)") {
    import org.apache.spark.sql.types.DecimalType
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val stateDir = java.nio.file.Files.createTempDirectory("graft-rollup-stream").toString
    val q = EventPipelines.startRollupMaintenance(input.toDF(), stateDir)
    val all = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(evs: Event*): Unit = { all ++= evs; input.addData(evs: _*); q.processAllAvailable() }
    try {
      feed(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 10.25),
        Event(2, ts("2024-01-01 11:00:00"), 1, "view", 5.50),
        Event(3, ts("2024-01-02 09:00:00"), 2, "click", 1.75))
      feed( // second batch touches an EXISTING key and a new one
        Event(4, ts("2024-01-01 12:00:00"), 2, "click", 2.25),
        Event(5, ts("2024-01-03 08:00:00"), 3, "purchase", 99.99))
      feed(Event(6, ts("2024-01-02 10:00:00"), 1, "click", 0.01))
      // latest state version vs a from-scratch aggregate of all fed rows
      val versions = new java.io.File(stateDir).list().filter(_.startsWith("v"))
        .map(_.drop(1).toLong)
      assert(versions.length >= 2, "expected one state version per non-empty batch")
      val state = spark.read.parquet(s"$stateDir/v${versions.max}")
        .orderBy("day", "event_type").collect()
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
          r.getDecimal(3).doubleValue()))
      val rebuilt = all.toSeq.toDF()
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value".cast(DecimalType(18, 2))).as("s"))
        .orderBy("day", "event_type").collect()
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
          r.getDecimal(3).doubleValue()))
      assert(state.toSeq == rebuilt.toSeq,
        s"\nstate   ${state.toSeq}\nrebuilt ${rebuilt.toSeq}")
    } finally q.stop()
  }

  test("foreachBatch sink lands each micro-batch as parquet (production sink path)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = java.nio.file.Files.createTempDirectory("graft-febatch").toString
    val q = EventPipelines.tumbling(input.toDF()).writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(s"$out/batch")
      }
      .start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 10.0),
        Event(2, ts("2024-01-01 10:45:00"), 2, "view", 5.0))
      q.processAllAvailable()
      val landed = spark.read.parquet(s"$out/batch")
      assert(landed.count() >= 1)
      assert(landed.columns.contains("hour_start"))
    } finally q.stop()
  }

  test("streaming histogram sketch merges micro-batches to the batch histogram") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.histogramSketch(input.toDF(), 0.0, 100.0).writeStream
      .outputMode("complete").format("memory").queryName("hist_sketch").start()
    val batch1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 5.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "click", 6.0),   // same bin as 5.0
      Event(3, ts("2024-01-01 10:02:00"), 2, "view", 55.0))
    val batch2 = Seq(
      Event(4, ts("2024-01-01 11:00:00"), 1, "click", 6.2),   // merges into batch1's bin
      Event(5, ts("2024-01-01 11:01:00"), 2, "view", 99.9),
      Event(6, ts("2024-01-01 11:02:00"), 2, "view", -17.0),  // clamps to bin 1
      Event(7, ts("2024-01-01 11:03:00"), 2, "view", 250.0))  // clamps to top bin
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("hist_sketch").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin")) ->
          r.getAs[Long]("cnt")).toMap
      val batch = EventPipelines
        .histogramSketch((batch1 ++ batch2).toDF(), 0.0, 100.0).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin")) ->
          r.getAs[Long]("cnt")).toMap
      // micro-batch state merging must reproduce the batch sketch exactly
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the 5.0/7.0/6.2 clicks share one bin across the two micro-batches
      assert(streamed(("click", 4L)) == 3L, streamed.toString)
      assert(streamed(("view", 1L)) == 1L, "below-domain value clamps to bin 1")
      assert(streamed(("view", 64L)) == 2L, "99.9 and above-domain share the top bin")
    } finally q.stop()
  }

  test("file stream with Trigger.AvailableNow drains a directory and stops") {
    // the backfill topology: files land on distributed storage, the stream
    // processes everything present, then terminates (batch-as-stream)
    val dir = java.nio.file.Files.createTempDirectory("graft-filestream").toString
    val events = Seq(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 10.0),
      Event(2, ts("2024-01-01 10:45:00"), 2, "view", 5.0)).toDF()
    events.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = EventPipelines.tumbling(stream).writeStream
      .outputMode("update").format("memory").queryName("avnow_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive) // AvailableNow terminates after draining
    val n = spark.sql("SELECT sum(n_events) FROM avnow_test").head().getLong(0)
    assert(n == 2)
  }

  test("streaming corpus ingestion gates quality, dedups content, lands parquet") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{CorpusIngest, DocEvent}
    val input = MemoryStream[DocEvent]
    val goodText = "the quick brown fox jumps over the lazy dog and the " +
      "cat watches from the fence while birds sing in the morning light " +
      "of a calm and pleasant day in the quiet town"
    val outDir = java.nio.file.Files.createTempDirectory("ingest-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString
    input.addData(
      DocEvent(1, ts("2024-01-01 10:00:00"), goodText, "web"),
      DocEvent(2, ts("2024-01-01 10:05:00"), goodText, "web"),       // exact dup
      DocEvent(3, ts("2024-01-01 10:10:00"), "x@@@@ ###", "web"),    // junk
      DocEvent(4, ts("2024-01-01 10:15:00"), goodText + " extra tail words here", "web"))
    val q = CorpusIngest.startToParquet(input.toDF(), outDir, ckpt)
    q.awaitTermination(60000)
    assert(!q.isActive)
    val landed = spark.read.parquet(outDir)
    val ids = landed.select("doc_id").collect().map(_.getLong(0)).sorted
    // doc 2 deduped (same content hash), doc 3 below the quality gate
    assert(ids.sameElements(Array(1L, 4L)))
    assert(landed.columns.toSet ==
      Set("doc_id", "ts", "source", "score", "h"))
  }

  test("native session_window aggregates merge across micro-batches under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = input.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s"), col("n_events"))
    // session-window streaming aggregation emits in Append mode only:
    // a session row appears once the watermark passes its end
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("native_sess_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 3, "click", 1.0),
        Event(2, ts("2024-01-01 09:10:00"), 3, "click", 1.0))
      q.processAllAvailable()
      // 2 hours later: a separate session for the same user
      input.addData(Event(3, ts("2024-01-01 11:30:00"), 3, "view", 1.0))
      q.processAllAvailable()
      // push the watermark (15:00 - 2h = 13:00) past both session ends so
      // they flush; the pusher's own session stays open and unemitted
      input.addData(Event(4, ts("2024-01-01 15:00:00"), 99, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT s, n_events FROM native_sess_test WHERE user_id = 3 ORDER BY s")
        .collect()
      // first session merged the two close events; the late event opened a new one
      assert(rows.length == 2)
      assert(rows(0).getTimestamp(0) == ts("2024-01-01 09:00:00") && rows(0).getLong(1) == 2)
      assert(rows(1).getTimestamp(0) == ts("2024-01-01 11:30:00") && rows(1).getLong(1) == 1)
      assert(spark.sql("SELECT count(*) FROM native_sess_test WHERE user_id = 99")
        .head().getLong(0) == 0)
    } finally q.stop()
  }

  test("streaming transition pairs match the batch lag-window across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.transitionPairs(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("trans_test").start()
    val batch1 = Seq(
      Event(1, ts("2024-01-01 09:00:00"), 7, "view", 1.0),
      Event(2, ts("2024-01-01 09:05:00"), 7, "click", 1.0),
      Event(3, ts("2024-01-01 09:01:00"), 8, "signup", 1.0))
    val batch2 = Seq(
      // user 7's chain continues ACROSS the micro-batch boundary via state
      Event(4, ts("2024-01-01 09:20:00"), 7, "purchase", 1.0),
      Event(5, ts("2024-01-01 09:30:00"), 8, "view", 1.0),
      Event(6, ts("2024-01-01 09:31:00"), 8, "purchase", 1.0))
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT from_type, to_type, count(*) AS n FROM trans_test GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // batch reference: the e11 lag-window over the SAME combined events
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val expected = (batch1 ++ batch2).toDS()
        .select($"user_id", $"event_type", lag($"event_type", 1).over(w).as("from_type"))
        .filter($"from_type".isNotNull)
        .groupBy($"from_type", $"event_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == expected, s"streamed=$streamed expected=$expected")
      assert(streamed(("view", "click")) == 1 && streamed(("click", "purchase")) == 1)
    } finally q.stop()
  }

  test("streaming sliding distinct finalizes the batch e14 counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.slidingDistinct(input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("slide_test").start()
    val batch1 = Seq(
      Event(1, ts("2024-01-01 09:00:00"), 7, "view", 1.0),
      Event(2, ts("2024-01-01 10:00:00"), 7, "click", 1.0), // same user+day: dedup
      Event(3, ts("2024-01-02 09:00:00"), 8, "view", 1.0))
    val batch2 = Seq(
      Event(4, ts("2024-01-03 09:00:00"), 7, "view", 1.0), // user 7 again, new day
      Event(5, ts("2024-01-05 09:00:00"), 9, "view", 1.0))
    // far-future sentinel: advances the watermark past every real window
    // end so append mode finalizes them (its own windows are discarded)
    val sentinel = Event(99, ts("2024-03-01 00:00:00"), 999, "view", 1.0)
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT date_format(wend_ts, 'yyyy-MM-dd') AS wend, active_users FROM slide_test")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .filter(_._1 < "2024-02-01") // drop sentinel-derived windows
      // batch reference over the same events: distinct users per 7-day window
      val dayUsers = (batch1 ++ batch2).map(e =>
        (e.ts.toLocalDateTime.toLocalDate, e.user_id)).distinct
      val allEnds = dayUsers.map(_._1).flatMap(d => (0 to 6).map(d.plusDays(_))).distinct
      val expected = allEnds.map { e =>
        e.toString -> dayUsers.filter { case (d, _) =>
          !d.isAfter(e) && !d.isBefore(e.minusDays(6)) }.map(_._2).distinct.size.toLong
      }.toMap
      assert(streamed == expected, s"streamed=$streamed expected=$expected")
      // the cross-batch window: Jan-05's trailing week sees users 7, 8, 9
      assert(streamed("2024-01-05") == 3)
    } finally q.stop()
  }

  test("stateful sessionization counts sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.sessionize(input.toDS()).writeStream
      .outputMode("update").format("memory").queryName("sess_test").start()
    try {
      // batch 1: two events 10 min apart → one session
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 09:10:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // batch 2: 2 hours later → second session for same user
      input.addData(Event(3, ts("2024-01-01 11:30:00"), 7, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM sess_test WHERE user_id = 7 ORDER BY n_events DESC").collect()
      assert(rows.head.getAs[Long]("n_sessions") == 2)
      assert(rows.head.getAs[Long]("n_events") == 3)
    } finally q.stop()
  }

  test("pathTriples: 3-step paths across batches with O(1) state (e18 parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipelines.pathTriples(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("path_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 09:10:00"), 1, "click", 1.0),
        Event(3, ts("2024-01-01 09:20:00"), 1, "purchase", 1.0), // in-batch triple
        Event(4, ts("2024-01-01 09:00:00"), 2, "view", 1.0),
        Event(5, ts("2024-01-01 09:05:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT p1, p2, p3 FROM path_test WHERE user_id = 1")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(b1.toSeq == Seq(("view", "click", "purchase")), b1.mkString(","))
      input.addData(
        // u2's third event arrives a batch later: the state carried the
        // first two, so the triple completes CROSS-batch
        Event(6, ts("2024-01-01 09:12:00"), 2, "click", 1.0),
        // u1: a 40-min gap breaks the session — event 3→7 must NOT form
        // (click, purchase, view); the following tight pair then rebuilds
        Event(7, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(8, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val all = spark.sql("SELECT user_id, p1, p2, p3 FROM path_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(all.count(_._1 == 2L) == 1)
      assert(all.filter(_._1 == 2L).head == ((2L, "view", "view", "click")))
      // u1 still has only the one in-session triple: the gap suppressed
      // both windows that spanned it
      assert(all.count(_._1 == 1L) == 1, all.mkString(","))
      // a third tight event now completes u1's rebuilt window
      input.addData(Event(9, ts("2024-01-01 10:09:00"), 1, "purchase", 1.0))
      q.processAllAvailable()
      val u1 = spark.sql("SELECT p1, p2, p3 FROM path_test WHERE user_id = 1")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(u1.toSet == Set(("view", "click", "purchase")) && u1.length == 2)
    } finally q.stop()
  }

  test("burstCounts: trailing-window counts across batches, state pruned (e17 parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 1h window for in-test reachability; the topology is windowMs-generic
    val q = EventPipelines.burstCounts(input.toDS(), windowMs = 3600L * 1000)
      .writeStream.outputMode("append").format("memory").queryName("burst_test").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 09:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 09:20:00"), 1, "click", 1.0),
        Event(3, ts("2024-01-01 09:40:00"), 1, "view", 1.0),
        Event(4, ts("2024-01-01 09:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT user_id, burst FROM burst_test ORDER BY user_id, ts_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // u1 accumulates 1,2,3 inside the hour; u2 sits at 1
      assert(b1.toSeq == Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)), b1.mkString(","))
      input.addData(
        // 10:10: 09:00 has left the 1h window; 09:20 and 09:40 remain
        Event(5, ts("2024-01-01 10:10:00"), 1, "view", 1.0),
        // exactly windowMs after 09:00: the boundary event is EXCLUDED
        Event(6, ts("2024-01-01 10:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val b2 = spark.sql(
        "SELECT user_id, burst FROM burst_test WHERE ts_ms >= " +
          ts("2024-01-01 10:00:00").getTime + " ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(b2.toSeq == Seq((1L, 3L), (2L, 1L)), b2.mkString(","))
      // per-user max parity with the batch kernel's contract: the max of
      // the emitted trailing counts IS max_burst over these events
      val mx = spark.sql(
        "SELECT user_id, max(burst) FROM burst_test GROUP BY user_id ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(mx.toSeq == Seq((1L, 3L), (2L, 1L)))
    } finally q.stop()
  }
}
