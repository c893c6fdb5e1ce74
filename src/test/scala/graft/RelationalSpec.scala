package graft

import graft.operators.Relational

class RelationalSpec extends GraftSpec {

  test("q01: one row per (returnflag, linestatus), counts sum to table size") {
    val rows = Relational.q01(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = graft.sources.Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp'1998-09-02 00:00:00'").count()
    assert(total == filtered)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q15: top-n is sorted descending and bounded") {
    val rows = Relational.q15(spark, sf).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q05 semi ∪ q06-style anti partition the dimension table") {
    val semi = Relational.q05(spark, sf).count()
    val urgentCusts = graft.sources.Tables.orders(spark, sf)
      .filter("o_orderpriority = '1-URGENT'").select("o_custkey").distinct().count()
    assert(semi == urgentCusts)
    val parts = graft.sources.Tables.part(spark, sf).count()
    val anti = Relational.q06(spark, sf).count()
    val withBigSales = graft.sources.Tables.lineitem(spark, sf)
      .filter("l_quantity > 45").select("l_partkey").distinct().count()
    assert(anti == parts - withBigSales)
  }

  test("q13 set ops: both + only_bal = hi_bal customer count") {
    val rows = Relational.q13(spark, sf).collect()
    val hiBal = graft.sources.Tables.customer(spark, sf).filter("c_acctbal > 8000").count()
    assert(rows.length == hiBal)
    assert(rows.map(_.getAs[String]("tag")).toSet.subsetOf(Set("both", "only_bal")))
  }

  test("q14 rollup: grand total row aggregates everything") {
    val rows = Relational.q14(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("status") == "ALL" &&
      r.getAs[String]("prio") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == graft.sources.Tables.orders(spark, sf).count())
  }

  test("q20 correlated scalar subquery returns a single scalar row") {
    val rows = Relational.q20(spark, sf).collect()
    assert(rows.length == 1)
  }
}
