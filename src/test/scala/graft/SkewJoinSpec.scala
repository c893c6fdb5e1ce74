package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends GraftSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under skew") {
    // simulate skew: 5k rows hammering one key + uniform tail
    val large = (Seq.fill(5000)(1L) ++ (2L to 500L)).toDF("k")
      .withColumn("v", monotonically_increasing_id())
    val small = (1L to 500L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = large.join(small, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", salts = 8)

    assert(salted.count() == plain.count())
    val a = plain.groupBy("k").count().orderBy("k").collect().toSeq
    val b = salted.groupBy("k").count().orderBy("k").collect().toSeq
    assert(a == b)
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
  }

  test("x01/x02 hot join arms agree and neither broadcasts the dim") {
    val plain = SkewJoin.hotJoinPlain(spark, sf)
    val salted = SkewJoin.hotJoinSalted(spark, sf)
    // the skew bench is meaningless if the dim broadcasts (no shuffle, no
    // skew): the hint must hold in both arms
    Seq("plain" -> plain, "salted" -> salted).foreach { case (n, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"),
        s"$n arm must shuffle-hash join:\n$p")
    }
    assert(plain.collect().toSeq == salted.collect().toSeq)
  }

  test("partial top-k equals the plain window and bounds the shuffled rows") {
    import graft.operators.TopKPerKey
    val plain = TopKPerKey.topkPlain(spark, sf).collect().toSeq
    val partial = TopKPerKey.topkPartial(spark, sf).collect().toSeq
    assert(plain == partial, "heap reduction must not change the result")
    // exactly k rows per key come out (every key has >= k rows here)
    import spark.implicits._
    val ds = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice",
        ($"l_orderkey" * 10 + $"l_linenumber").as("rid"))
      .as[(String, Double, Long)]
    val nKeys = ds.map(_._1).distinct().count()
    assert(TopKPerKey.topK(ds, 5).count() == nKeys * 5)
  }

  test("key histogram surfaces the hot key") {
    val events = Tables.events(spark, sf)
    val hist = SkewJoin.keyHistogram(events, "event_type", topN = 5).collect()
    assert(hist.nonEmpty && hist.length <= 5)
    val counts = hist.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }

  test("x07/x08: AQE splits the skewed partition at runtime, result unchanged") {
    // The split is a RUNTIME re-plan — it only exists in the final
    // adaptive plan after execution, which is exactly why x02's manual
    // salting and this automated split are separate entries: one is a
    // query rewrite, the other a scheduler decision.
    val (offDf, offPlan) = SkewJoin.hotJoinAqe(spark, sf, on = false)
    val (onDf, onPlan) = SkewJoin.hotJoinAqe(spark, sf, on = true)
    assert(onPlan.contains("skew=true"),
      s"lowered thresholds must trigger OptimizeSkewedJoin:\n$onPlan")
    assert(!offPlan.contains("skew=true"),
      s"disabled arm must not split:\n$offPlan")
    // splitting a partition replicates build rows across sub-partitions;
    // the join result must be bit-identical
    assert(onDf.collect().toSeq == offDf.collect().toSeq)
    // confs restored after both windows
    Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").foreach { k =>
      assert(!spark.conf.getOption(k).exists(v => v == "16KB" || v == "8KB" || v == "-1"),
        s"conf window leaked: $k=${spark.conf.getOption(k)}")
    }
  }
}
