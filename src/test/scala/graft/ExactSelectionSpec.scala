package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{ExactSelection, Relational}

/** Distributed exact selection (q10's kernel) vs Spark's builtin
  * `percentile` aggregate: same bit-exact result, without the
  * all-values-in-one-buffer plan shape. */
class ExactSelectionSpec extends GraftSpec {

  private def builtin(ps: Seq[Double], col0: String): Map[String, Seq[Double]] = {
    val li = graft.sources.Tables.lineitem(spark, sf)
    li.groupBy(col("l_returnflag"))
      .agg(expr(s"percentile($col0, ${ps.head}d)"),
        ps.tail.map(p => expr(s"percentile($col0, ${p}d)")): _*)
      .collect()
      .map(r => r.getString(0) -> (1 to ps.length).map(r.getDouble))
      .toMap
  }

  test("matches builtin percentile bit-exactly on lineitem quantities") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val got = ExactSelection.percentiles(
      li.select(col("l_returnflag").as("g"), col("l_quantity").cast("double").as("x")),
      Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    assert(got == builtin(Seq(0.5, 0.9), "l_quantity"))
  }

  test("matches builtin percentile bit-exactly on lineitem prices") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val got = ExactSelection.percentiles(
      li.select(col("l_returnflag").as("g"), col("l_extendedprice").cast("double").as("x")),
      Seq(0.5))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1))).toMap
    assert(got == builtin(Seq(0.5), "l_extendedprice"))
  }

  test("matches builtin on adversarial distributions (ties, skew, single values)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy ties, heavy skew, a single-value group, a two-value group, and
    // a group whose values concentrate in a sliver of the global range
    val rows =
      (1 to 5000).map(_ => ("ties", (rnd.nextInt(5) + 1).toDouble)) ++
      (1 to 5000).map(_ => ("skew", math.pow(10.0, rnd.nextDouble() * 6))) ++
      Seq(("single", 42.0)) ++
      Seq(("two", 1.0), ("two", 2.0)) ++
      (1 to 3000).map(_ => ("sliver", 1000.0 + rnd.nextDouble() * 1e-4)) ++
      (1 to 3000).map(_ => ("neg", rnd.nextDouble() * 200 - 100))
    val df = rows.toDF("g", "x")
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    val want = df.groupBy(col("g"))
      .agg(expr(s"percentile(x, ${ps.head}d)"),
        ps.tail.map(p => expr(s"percentile(x, ${p}d)")): _*)
      .collect().map(r => r.getString(0) -> (1 to ps.length).map(r.getDouble)).toMap
    val got = ExactSelection.percentiles(df, ps)
      .collect().map(r => r.getString(0) -> (1 to ps.length).map(r.getDouble)).toMap
    assert(got == want)
  }

  test("q10 result matches the former builtin-percentile formulation") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val want = li.groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"))
      .orderBy(col("l_returnflag")).collect().toSeq
    val got = Relational.q10(spark, sf).collect().toSeq
    assert(got == want)
  }

  test("percentilesDisc matches brute-force rank selection incl. ties and the p=1 edge") {
    import spark.implicits._
    val data = Seq(
      "a" -> Seq(5.0, 1.0, 3.0, 3.0, 2.0),           // ties at 3.0
      "b" -> Seq(10.0),                              // single element
      "c" -> (1 to 100).map(_.toDouble)              // smooth run
    )
    val df = data.flatMap { case (g, xs) => xs.map(g -> _) }.toDF("g", "x")
    // 0.07 is the adversarial rank case: 0.07*100 = 7.000000000000001 in
    // double, so a double-ceil rank is 8 while the ANSI/exact answer is 7
    val ps = Seq(0.01, 0.07, 0.5, 0.95, 1.0)
    // expected ranks from EXACT rational arithmetic, independent of the
    // kernel's implementation: k = ceil(round(p*1e6) * n / 1e6)
    def rank(p: Double, n: Int): Int = {
      val pn = math.round(p * 1000000L)
      math.max(1L, (pn * n + 999999L) / 1000000L).toInt
    }
    assert(rank(0.07, 100) == 7 && math.ceil(0.07 * 100).toInt == 8,
      "the adversarial case must actually separate exact from double ranks")
    val want = data.map { case (g, xs) =>
      val sorted = xs.sorted
      g -> ps.map(p => sorted(rank(p, xs.length) - 1))
    }.toMap
    val got = ExactSelection.percentilesDisc(df, ps)
      .collect().map(r => r.getString(0) -> (1 to ps.length).map(r.getDouble)).toMap
    assert(got == want)
    // disc results are always actual data values
    got.foreach { case (g, vs) =>
      val xs = data.toMap.apply(g).toSet
      vs.foreach(v => assert(xs.contains(v)))
    }
  }

  test("q10's plan carries no unbounded-buffer percentile aggregate") {
    val plan = Relational.q10(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      "q10 must not plan the builtin percentile aggregate (one buffer holds " +
        "every group value — the r10-flagged scale killer):\n" + plan)
  }
}
