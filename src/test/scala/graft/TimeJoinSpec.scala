package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Semantics + plan-shape specs for the time-series join operators. */
class TimeJoinSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf matches the latest build row at-or-before each probe row, per key") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after b@09:00 and b@09:30 → 09:30
      (2L, 10L, ts("2024-01-01 09:30:00")),  // exactly at a build row → matches it
      (3L, 10L, ts("2024-01-01 08:00:00")),  // before any build row → null
      (4L, 20L, ts("2024-01-01 10:00:00"))   // other key, no build rows → null
    ).toDF("id", "k", "t")
    val build = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0),
      (10L, ts("2024-01-01 09:30:00"), 2.0),
      (30L, ts("2024-01-01 09:59:00"), 9.0)  // right key never probed
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(probe, build, "k", "t", Seq("v"))
      .orderBy($"id").collect()
    assert(got.map(r => Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toSeq ==
      Seq(Some(2.0), Some(2.0), None, None))
    assert(got(0).getAs[Timestamp]("asof_t") == ts("2024-01-01 09:30:00"))
    // probe columns pass through untouched
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("asOf plan: one exchange on the key, no nested-loop/cartesian join") {
    val plan = graft.operators.AsOfJoin.clickLastView(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), s"asOf must execute as a window, got:\n$plan")
  }

  test("range join by bucket equals the naive range join") {
    val left = Seq((1L, 100L), (2L, 250L), (3L, 1000L)).toDF("lid", "start_s")
    val right = Seq((150L, 1.0), (250L, 2.0), (349L, 3.0), (350L, 4.0), (999L, 5.0))
      .toDF("at_s", "v")
    val naive = left.join(right,
        $"at_s" >= $"start_s" && $"at_s" < $"start_s" + 100L)
      .select($"lid", $"at_s").orderBy($"lid", $"at_s").collect().toSeq
    val bucketed = RangeJoin.byBucket(left, right, "start_s", "at_s",
        widthSec = 100L, bucketSec = 30L)
      .select($"lid", $"at_s").orderBy($"lid", $"at_s").collect().toSeq
    assert(bucketed == naive, s"bucketed=$bucketed naive=$naive")
  }

  test("range join plan avoids nested-loop joins (equi-join on buckets)") {
    val plan = RangeJoin.signupAttribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
