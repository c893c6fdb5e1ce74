package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.pipeline.Incremental
import graft.text.TextAnalysis

/** Round-4 operators: incremental corpus maintenance, repetition/PII text
  * signals, contamination, int8 quantization, approx percentile bound. */
class IncrementalSpec extends GraftSpec {
  import spark.implicits._

  test("upsert keeps highest version per key and passes unmatched keys through") {
    val base = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 0)).toDF("k", "v", "ver")
    val upd = Seq((2L, "b2", 1), (4L, "d", 1)).toDF("k", "v", "ver")
    val got = Incremental.upsert(base, upd, "k", "ver")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got == Map(1L -> ("a", 0), 2L -> ("b2", 1), 3L -> ("c", 0), 4L -> ("d", 1)))
    // version ties resolve by content hash — a deterministic function of
    // the data, stable across shuffles and repartitionings
    val tied = Seq((9L, "zz", 1), (9L, "aa", 1)).toDF("k", "v", "ver")
    val winners = (1 to 3).map { i =>
      Incremental.upsert(base.repartition(i), tied.repartition(4 - i), "k", "ver")
        .filter($"k" === 9L).head().getString(1)
    }
    assert(winners.distinct.size == 1)
  }

  test("upsert is idempotent: re-applying the same update batch changes nothing") {
    val base = Seq((1L, "a", 0), (2L, "b", 0)).toDF("k", "v", "ver")
    val upd = Seq((2L, "b2", 1), (3L, "c", 1)).toDF("k", "v", "ver")
    val once = Incremental.upsert(base, upd, "k", "ver")
    val twice = Incremental.upsert(once, upd, "k", "ver")
    assert(once.orderBy($"k").collect().toSeq == twice.orderBy($"k").collect().toSeq)
  }

  test("p05 shard packing is deterministic across independent executions") {
    // two fresh range-shuffles (fresh sampler seeds) must agree
    val a = graft.pipeline.Splits.shardPack(spark, sf).collect().toSeq
    val b = graft.pipeline.Splits.shardPack(spark, sf).collect().toSeq
    assert(a == b)
    // and the two invocations left nothing behind: shardPack pins its
    // range boundaries via localCheckpoint, not a session-lifetime cache
    // entry (the round-4 ADVICE leak)
    assert(spark.sharedState.cacheManager.isEmpty,
      "shardPack must not leak cacheManager entries")
  }

  test("p04 incremental dedup classifies recrawls, batch dupes, and fresh docs") {
    val got = Incremental.incrementalDedup(spark, sf)
      .groupBy($"decision").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every decision class must occur (the batch includes recrawled
    // corpus pages and a double submission by construction)
    assert(got.keySet == Set("new", "dup_of_existing", "dup_in_batch"))
    assert(got("dup_of_existing") >= 1 && got("dup_in_batch") >= 1)
  }

  test("t07 repetition flags a repetitive doc above a varied one") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam ham"),
      (2L, "every word in this sentence is different")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("dup_word_frac") > 0.6)
    assert(got(1L).getAs[String]("top_word") == "spam")
    assert(got(1L).getAs[Double]("top_word_frac") > 0.8)
    assert(got(2L).getAs[Double]("dup_word_frac") == 0.0)
    // tiebreak: equal counts pick the lexicographically first word
    val tie = Seq((3L, "bb aa")).toDF("doc_id", "text")
    assert(TextAnalysis.repetition(tie).head().getAs[String]("top_word") == "aa")
  }

  test("t08 PII redaction finds and redacts emails, IPs, and phones") {
    // doc_id 1 dodges the %5 injection, so the kernel runs on the raw text
    val df = Seq(
      (1L, "mail me at jo.doe@corp.example.org or 192.168.0.12 tel 555-1234 ok"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(df).head()
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_ips") == 1)
    assert(r.getAs[Int]("n_phones") == 1)
    val expected = "mail me at <EMAIL> or <IP> tel <PHONE> ok"
    assert(r.getAs[Int]("redacted_len") == expected.length)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("redacted_md5") == md)
  }

  test("d12 bloom-prefiltered contamination returns exactly d07's answer") {
    // the Bloom is a prefilter, the confirm join is exact — so any
    // divergence from d07 means a false negative (dropped hit) or a
    // leaked false positive, both bugs
    val viaBloom = Dedup.bloomContamination(spark, sf).collect().toSeq
    val exact = Dedup.contamination(spark, sf).collect().toSeq
    assert(viaBloom == exact)
  }

  test("d07 contamination flags exactly the docs sharing benchmark 8-grams") {
    val rows = Dedup.contamination(spark, sf).collect()
    val flagged = rows.filter(_.getAs[Boolean]("contaminated")).map(_.getLong(0))
    // benchmark members always self-match (they are IN the corpus)
    val bench = rows.map(_.getLong(0)).filter(_ % 97 == 0)
    assert(bench.forall(flagged.contains))
    rows.foreach { r =>
      assert((r.getAs[Long]("n_shared_grams") > 0) == r.getAs[Boolean]("contaminated"))
    }
  }

  test("a04 quantization error is bounded by half a quantization step per axis") {
    Ann.quantize(spark, sf).collect().foreach { r =>
      val scale = r.getAs[Double]("scale")
      val err = r.getAs[Double]("q_err_l2")
      // worst case: every one of the 64 axes off by scale/2
      assert(err <= scale / 2.0 * math.sqrt(64.0) + 1e-9)
      assert(r.getAs[Long]("q_abs_sum") <= 127L * 64)
    }
  }

  test("t09 tf-idf ranks every source's top words with positive scores") {
    val rows = TextAnalysis.tfidf(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(0))
    bySource.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      // idf zeroes out corpus-universal words; ranked terms must carry signal
      assert(rs.forall(_.getDouble(3) > 0.0))
    }
  }

  test("a05 quantized top-10 recall stays high (int8 barely perturbs ranking)") {
    val rows = Ann.quantizedRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // self-match always survives quantization
      assert(r.getAs[Long]("n_common") >= 1L)
      assert(r.getAs[Double]("recall_at_10") >= 0.5)
    }
  }

  test("q106 merged HLL sketch estimates stay within 5% of exact distinct counts") {
    val est = graft.operators.Relational.q106(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cust = graft.sources.Tables.customer(spark, sf)
      .join(graft.sources.Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
    val exactPerNation = cust.groupBy($"n_name")
      .agg(countDistinct($"c_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = cust.select(countDistinct($"c_custkey")).head().getLong(0)
    exactPerNation.foreach { case (nation, exact) =>
      assert(math.abs(est(nation) - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"$nation: est ${est(nation)} vs exact $exact")
    }
    assert(math.abs(est("ALL") - exactAll) <= math.max(1L, (exactAll * 0.05).toLong))
  }

  test("e05 funnel stages are monotonically non-increasing with valid rates") {
    val got = graft.operators.Events.funnel(spark, sf).collect()
    assert(got.map(_.getString(0)).sameElements(
      Array("1_signup", "2_view_after_signup", "3_purchase_after_view")))
    val ns = got.map(_.getLong(1))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(0) > 0)
    got.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("p05 shard packing conserves tokens and numbers shards contiguously") {
    val shards = graft.pipeline.Splits.shardPack(spark, sf).collect()
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(sum(size(split(trim($"text"), "\\s+")).cast("long")))
      .head().getLong(0)
    assert(shards.map(_.getAs[Long]("shard_tokens")).sum == totalTokens)
    shards.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("shard_id")).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)), "shard ids must be contiguous from 0")
    }
  }

  test("p10 sequence packing conserves docs/tokens, respects the budget, numbers contiguously") {
    val budget = 1024L
    val seqs = graft.pipeline.Splits.packSequences(spark, sf, budget).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(count(lit(1)), sum(size(split(trim($"text"), "\\s+")).cast("long")))
      .head()
    assert(seqs.map(_.getAs[Long]("n_docs")).sum == docs.getLong(0))
    assert(seqs.map(_.getAs[Long]("seq_tokens")).sum == docs.getLong(1))
    seqs.foreach { r =>
      // an over-budget sequence is legal ONLY as a single oversized doc
      if (r.getAs[Boolean]("overflow")) assert(r.getAs[Long]("n_docs") == 1L, r.toString)
      assert((r.getAs[Long]("seq_tokens") > budget) == r.getAs[Boolean]("overflow"))
    }
    seqs.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
      val ids = rs.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)),
        s"shard $sh sequence ids must be contiguous from 0")
    }
    // deterministic across independent executions (stateful scan + hash
    // shuffle must not leak partition-layout dependence)
    val again = graft.pipeline.Splits.packSequences(spark, sf, budget).collect()
    assert(seqs.toSeq == again.toSeq)
  }

  test("m04 perceptual hash is deterministic and groups equal-content payloads") {
    val a = graft.multimodal.Multimodal.perceptualHash(spark, sf).collect()
    val b = graft.multimodal.Multimodal.perceptualHash(spark, sf).collect()
    assert(a.sameElements(b))
    // n_same must equal the actual multiplicity of each dhash value
    val mult = a.groupBy(_.getAs[Long]("dhash")).view.mapValues(_.length).toMap
    a.foreach(r => assert(r.getAs[Long]("n_same") == mult(r.getAs[Long]("dhash"))))
  }

  test("q104 approx percentiles sit within 1% of exact percentiles") {
    val approx = graft.operators.Relational.q104(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approx.foreach { case (flag, (p50, p90, p99)) =>
      val e = exact(flag)
      assert(math.abs(p50 - e(0)) / e(0) < 0.01)
      assert(math.abs(p90 - e(1)) / e(1) < 0.01)
      assert(math.abs(p99 - e(2)) / e(2) < 0.01)
    }
  }

  test("p06 global shuffle covers every doc once, shards balanced, order pinned") {
    val res = graft.pipeline.Splits.globalShuffle(spark, sf).collect()
    assert(res.length == 16)
    val total = res.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(total == nDocs, s"shuffle must be a permutation: $total vs $nDocs")
    val counts = res.map(_.getAs[Long]("n_docs"))
    assert(counts.max <= counts.min * 2, s"hash sharding skewed: ${counts.toSeq}")
    // identical across independent executions — that's the whole point
    val res2 = graft.pipeline.Splits.globalShuffle(spark, sf).collect()
    assert(res.sameElements(res2))
  }

  test("p09 curriculum: high tier identical every epoch, coverage strictly grows") {
    val rows = graft.pipeline.Splits.curriculum(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(1, 2, 3))
    assert(byEpoch(1).map(_.getAs[String]("bin")).toSet == Set("high"))
    assert(byEpoch(2).map(_.getAs[String]("bin")).toSet == Set("high", "mid"))
    assert(byEpoch(3).map(_.getAs[String]("bin")).toSet == Set("high", "mid", "low"))
    // the high bin's keep rate is 1.0 in every epoch — same docs, same checksum
    val high = rows.filter(_.getAs[String]("bin") == "high")
      .map(r => (r.getAs[Long]("n_kept"), r.getAs[Long]("id_checksum")))
    assert(high.distinct.length == 1, high.mkString(", "))
    def total(e: Int) = byEpoch(e).map(_.getAs[Long]("n_kept")).sum
    assert(total(1) < total(2) && total(2) < total(3))
  }

  test("p07 mixture keeps full top tier and downsamples the web tier ~10x") {
    val kept = graft.pipeline.Splits.mixture(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy($"source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    (0 until 5).foreach { i =>
      assert(kept(s"src$i") == totals(s"src$i"), s"src$i must keep 100%")
    }
    val webKept = (10 until 20).map(i => kept.getOrElse(s"src$i", 0L)).sum.toDouble
    val webTotal = (10 until 20).map(i => totals(s"src$i")).sum.toDouble
    assert(webKept / webTotal > 0.03 && webKept / webTotal < 0.25,
      s"web tier keep rate ${webKept / webTotal} should be ~0.1")
  }

  test("p11 temperature mixture: rates follow n^-0.5 ordering and hit the half-corpus target") {
    val rows = graft.pipeline.Splits.temperatureMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // temperature flattening: a smaller source never gets a LOWER rate
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    byN.map(_.getAs[Double]("rate")).sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0) >= w(1) - 1e-9, "rate must be non-increasing in source size")
    }
    // expected total ≈ target (hash threshold is uniform; ±10% slack), and
    // the expected keep mass Σ n·rate is the half-corpus target by design
    val expected = rows.map(r => r.getAs[Long]("n_docs") * r.getAs[Double]("rate")).sum
    assert(math.abs(expected - nTotal / 2) < 0.02 * nTotal,
      s"Σ n·rate = $expected should be ~${nTotal / 2}")
    val kept = rows.map(_.getAs[Long]("n_kept")).sum.toDouble
    assert(kept > 0.4 * nTotal && kept < 0.6 * nTotal)
  }

  test("p14 token-budget mixture: rates in TOKEN space, kept token mass hits the share") {
    val rows = graft.pipeline.Splits.tokenBudgetMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val tokTotal = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // temperature flattening in TOKEN space: a token-smaller source
    // never gets a lower rate
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTok.map(_.getAs[Double]("rate")).sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0) >= w(1) - 1e-9, "rate must be non-increasing in token mass")
    }
    // the expected keep TOKEN mass Σ tok_s·rate is the half-corpus token
    // budget by construction, and the hash-realized mass lands near it
    val expected = rows.map(r => r.getAs[Long]("n_tokens") * r.getAs[Double]("rate")).sum
    assert(math.abs(expected - tokTotal / 2) < 0.02 * tokTotal,
      s"sum tok*rate = $expected should be ~${tokTotal / 2}")
    val keptTok = rows.map(_.getAs[Long]("kept_tokens")).sum.toDouble
    assert(keptTok > 0.4 * tokTotal && keptTok < 0.6 * tokTotal)
    // the point of token budgeting vs p11: per-source allocation follows
    // sqrt TOKEN mass — replay the share arithmetic driver-side exactly
    val sSum = rows.map(r =>
      BigDecimal(math.sqrt(r.getAs[Long]("n_tokens").toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    rows.foreach { r =>
      val toks = r.getAs[Long]("n_tokens").toDouble
      val want = math.min(1.0,
        ((tokTotal / 2).toDouble * math.sqrt(toks) / sSum) / toks)
      // the report carries round(rate, 6) of the pre-grid rate
      assert(math.abs(r.getAs[Double]("rate") - want) < 1.01e-6,
        s"${r.getString(0)}: rate ${r.getAs[Double]("rate")} vs replay $want")
    }
  }

  test("p15 reservoir sample: exactly n, content-addressed rank replayed, idempotent") {
    import org.apache.spark.unsafe.types.UTF8String
    val rows = graft.pipeline.Splits.reservoirSample(spark, sf, n = 10).collect()
    assert(rows.length == 10)
    // replay the selection driver-side: seeded hash64 over EVERY doc id,
    // 10 smallest (signed compare) — the sample is a pure function of
    // the corpus, nothing else
    val all = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val ranked = all.map(id =>
      (graft.functions.Kernels.hash64(UTF8String.fromString(s"smp:$id"), 0L), id))
      .sortBy(identity).take(10)
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == ranked.map(_._2).sorted.toSeq)
    val hByDoc = ranked.map(_.swap).toMap
    rows.foreach(r => assert(r.getAs[Long]("h") == hByDoc(r.getAs[Long]("doc_id"))))
    // idempotence: the rerun (a retried 100 TB stage) returns the same ids
    val again = graft.pipeline.Splits.reservoirSample(spark, sf, n = 10).collect()
    assert(again.map(_.getAs[Long]("doc_id")).toSeq ==
      rows.map(_.getAs[Long]("doc_id")).toSeq)
    // n larger than the corpus degrades to the whole corpus, still ordered
    val whole = graft.pipeline.Splits.reservoirSample(spark, sf, n = 1000000).collect()
    assert(whole.length == all.length)
  }

  test("p13 epoch mixture: budgets hit, replication real, small sources repeat more") {
    val rows = graft.pipeline.Splits.epochMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val target = r.getAs[Long]("target")
      val full = r.getAs[Long]("full_epochs")
      val emitted = r.getAs[Long]("n_emitted")
      assert(full == target / nDocs, "full_epochs is the integer epoch floor")
      // threshold selection is uniform-hash: emitted lands near target
      assert(math.abs(emitted - target) <= math.max(8L, (0.1 * target).toLong),
        s"${r.getAs[String]("source")}: emitted $emitted vs target $target")
      // replication really happened: max_epoch covers every full epoch
      assert(r.getAs[Long]("max_epoch") >= full)
      assert(r.getAs[Long]("n_docs_used") <= nDocs)
      assert(r.getAs[Double]("realized_epochs") > 0.0)
    }
    // the whole point: total budget ~2x the corpus, and smaller sources
    // get MORE epochs than larger ones (sqrt-share upsampling)
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    val emittedTotal = rows.map(_.getAs[Long]("n_emitted")).sum
    assert(math.abs(emittedTotal - 2L * nTotal) < 0.05 * nTotal,
      s"total emitted $emittedTotal should be ~${2L * nTotal}")
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    byN.map(_.getAs[Double]("realized_epochs")).sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0) >= w(1) - 1e-9, "epochs must be non-increasing in source size")
    }
    // at least one source genuinely repeats (epoch >= 2) at this skew
    assert(rows.exists(_.getAs[Long]("full_epochs") >= 2L),
      "smallest sources should run multiple full epochs")
  }

  test("e08 retention matrix: k=0 reproduces each cohort's size") {
    val rows = graft.operators.Events.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    val k0 = rows.filter(_.getAs[Int]("week_k") == 0)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_active")).toMap
    // every cohort appears at k=0 (a user purchases in their own first week
    // by construction) and no later week exceeds the cohort's size
    rows.foreach { r =>
      val c = r.getAs[String]("cohort_week")
      assert(k0.contains(c), s"cohort $c missing k=0 row")
      assert(r.getAs[Long]("n_active") <= k0(c))
      assert(r.getAs[Int]("week_k") >= 0)
    }
  }

  test("p12: delta-merged rollup equals the from-scratch recompute; state is real parquet") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val merged = graft.pipeline.Incremental.incrementalRollup(spark, sf).collect().toSeq
    val rebuilt = graft.sources.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("day"), col("event_type")).collect().toSeq
    assert(merged == rebuilt, "incremental maintenance must equal a full rebuild")
    // the persisted state exists, is parquet, and covers only pre-cutoff days
    val state = spark.read.parquet(
      System.getProperty("java.io.tmpdir") + "/graft_rollup_state")
    val maxDay = state.agg(max(col("day"))).head().getDate(0).toString
    assert(maxDay < "2024-01-24", s"state leaked post-cutoff days: $maxDay")
    assert(state.count() > 0)
  }

  test("p16 snapshot diff classifies exactly the mutation classes") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val n = docs.size.toLong
    val rows = Incremental.snapshotDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("change")).toMap
    // every base doc and every synthetic insert id is classified, once
    assert(rows.size == docs.size + docs.count(_ % 25 == 0))
    docs.foreach { id =>
      val want =
        if (id % 10 == 7) "deleted"
        else if (id % 4 == 0) "updated"
        else "unchanged"
      assert(rows(id) == want, s"doc $id: ${rows(id)} != $want")
    }
    docs.filter(_ % 25 == 0).foreach { id =>
      assert(rows(id + n) == "inserted", s"insert ${id + n}")
    }
    // hash columns carry the evidence: deleted rows lose v1, inserted v0
    Incremental.snapshotDiff(spark, sf).collect().foreach { r =>
      r.getAs[String]("change") match {
        case "deleted"  => assert(r.isNullAt(r.fieldIndex("v1_md5")))
        case "inserted" => assert(r.isNullAt(r.fieldIndex("v0_md5")))
        case "updated"  => assert(r.getString(2) != r.getString(3))
        case _          => assert(r.getString(2) == r.getString(3))
      }
    }
  }
}
