package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.operators.Relational
import graft.sources.Tables

/** Semantics specs for the round-7 batch (a09 k-means training,
  * q114 map_union, q115 mergeable histogram-quantile sketch). */
class SketchOpsSpec extends GraftSpec {

  test("a09 kmeans train: cells partition the corpus; report fields sane") {
    val res = Ann.kmeansTrain(spark, sf)
    val p = res.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    val rows = res.collect()
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == corpus,
      "every vector must land in exactly one cell after training")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_sim") > 0.0 && r.getAs[Double]("avg_sim") <= 1.0)
      assert(r.getAs[Double]("centroid_norm") > 0.0)
      val shift = r.getAs[Double]("shift")
      assert(shift >= 0.0 && !shift.isNaN && !shift.isInfinite, r.toString)
    }
  }

  test("a09 training does not lose cohesion vs the single a06 Lloyd step") {
    def weighted(rows: Array[Row]): Double = {
      val n = rows.map(_.getAs[Long]("n_members")).sum.toDouble
      rows.map(r => r.getAs[Long]("n_members") * r.getAs[Double]("avg_sim")).sum / n
    }
    val one = weighted(Ann.kmeansStep(spark, sf).collect())
    val trained = weighted(Ann.kmeansTrain(spark, sf).collect())
    assert(trained >= one - 1e-6,
      s"3-round training cohesion $trained fell below single-step $one")
  }

  test("a10 trained-IVF recall: one row per probe, self-hit guarantees overlap") {
    val rows = Ann.ivfTrainedRecall(spark, sf).collect()
    // a probe's own vector tops both rankings and its own cell is its #1
    // probed cell, so every probe overlaps at least on itself
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_common")
      assert(n >= 1 && n <= 10, r.toString)
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.1 && rec <= 1.0, r.toString)
    }
  }

  test("a13 IVF-PQ ADC recall: one row per probe, bounded, non-degenerate") {
    val rows = Ann.ivfpqRecall(spark, sf).collect()
    assert(rows.length == 5)
    // unlike a10 the self-hit is NOT guaranteed: the probe's own ADC
    // distance is its quantization error, which other candidates can
    // undercut — so assert bounds, not a floor per probe
    rows.foreach { r =>
      val n = r.getAs[Long]("n_common")
      assert(n >= 0 && n <= 10, r.toString)
      assert(math.abs(r.getAs[Double]("recall_at_10") - n / 10.0) < 1e-9, r.toString)
    }
    // but a 2-byte code must beat random guessing somewhere: at least one
    // probe recovers some of the exact top-10 through ADC ranking
    assert(rows.map(_.getAs[Long]("n_common")).sum >= 5,
      rows.mkString(", "))
  }

  test("q114 map_union: n_keys = distinct years per status; canonical order") {
    val rows = Relational.q114(spark, sf).collect()
    assert(rows.nonEmpty)
    val expect = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(year(col("o_orderdate"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val entries = r.getAs[String]("map_union").split("\\|").toSeq
      assert(entries == entries.sorted, "entries must emit canonically sorted")
      assert(entries.forall(_.matches("\\d{4}:\\d+")), entries.mkString("|"))
      assert(entries.size == r.getAs[Int]("n_keys"))
      assert(r.getAs[Int]("n_keys").toLong ==
        expect(r.getAs[String]("o_orderstatus")),
        "union keys must cover every year seen by any priority's map")
    }
  }

  test("q114 duplicate keys resolve first-wins in priority order") {
    val kv = Relational.q114(spark, sf).collect().flatMap { r =>
      r.getAs[String]("map_union").split("\\|").map { e =>
        val Array(k, v) = e.split(":")
        (r.getAs[String]("o_orderstatus"), k.toInt) -> v.toLong
      }
    }.toMap
    val firstWins = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"),
        year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("o_orderstatus"), col("yr"))
      .agg(min_by(col("cnt"), col("o_orderpriority")).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(kv == firstWins)
  }

  test("q115 sketch: merged n = Σ leaf n (true sketch merge); quantiles ordered") {
    val rows = Relational.q115(spark, sf).collect()
    val (leaf, merged) = rows.partition(_.getAs[String]("level") == "leaf")
    assert(leaf.nonEmpty && merged.nonEmpty)
    val leafN = leaf.groupBy(_.getAs[String]("l_returnflag"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    merged.foreach { m =>
      assert(m.getAs[String]("l_linestatus") == "ALL")
      assert(m.getAs[Long]("n") == leafN(m.getAs[String]("l_returnflag")),
        "merged sketch count must equal the sum of its leaf sketches")
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95") + 1e-9, r.toString)
      assert(r.getAs[Double]("p95") <= r.getAs[Double]("p99") + 1e-9, r.toString)
    }
  }

  test("q115 sketch error is bounded by one log-bin factor vs the exact percentile") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("double").as("x"))
    val Row(lo: Double, hi: Double) = li.agg(min(col("x")), max(col("x"))).head
    // prices are strictly positive, so the sketch runs its log-scaled
    // regime: error is RELATIVE, one bin = factor (hi/lo)^(1/256)
    assert(lo > 0, "lineitem prices must put the sketch in log mode")
    val ratio = math.pow(hi / lo, 1.0 / 256)
    val grp = Seq(col("l_returnflag"), col("l_linestatus"))
    val exact = li
      .withColumn("rn", row_number().over(
        Window.partitionBy(grp: _*).orderBy(col("x"), monotonically_increasing_id())))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(grp: _*)))
      .filter(col("rn") === ceil(col("n") * 0.95))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("x"))
      .toMap
    Relational.q115(spark, sf).collect()
      .filter(_.getAs[String]("level") == "leaf")
      .foreach { r =>
        val key = (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
        val x = exact(key)
        val p95 = r.getAs[Double]("p95")
        // p95 is the lower edge of the log bin holding the ceil-rank element
        assert(p95 <= x + 1e-4 && x <= p95 * ratio + 1e-4,
          s"$key exact=$x sketch=$p95 ratio=$ratio")
      }
  }
}
