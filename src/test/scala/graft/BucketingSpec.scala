package graft

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends GraftSpec {
  import spark.implicits._

  test("joining two co-bucketed tables runs without any Exchange") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Bucketing.writeBucketed(orders, "orders_b", 8, "o_orderkey")
    Bucketing.writeBucketed(lineitem, "lineitem_b", 8, "l_orderkey")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle the fact table:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle the orders table:\n$plan")
      // and the result matches the plain-table join
      val expected = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
