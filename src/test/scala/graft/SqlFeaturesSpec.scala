package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Semantics specs for the SQL-surface batch: q112 (skewness/kurtosis),
  * q113 (multimap_agg), s07 (WITH RECURSIVE), s08 (LATERAL). */
class SqlFeaturesSpec extends GraftSpec {

  test("q112: closed-form moments equal Spark's builtin skewness/kurtosis") {
    val builtin = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Relational.q112(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sk, ku) = builtin(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Double]("skew_qty") - sk) < 1e-6,
        s"closed-form skewness must match the builtin definition: $r vs $sk")
      assert(math.abs(r.getAs[Double]("kurt_qty") - ku) < 1e-6,
        s"closed-form kurtosis must match the builtin definition: $r vs $ku")
    }
  }

  test("q113: multimap collects ALL values per key, canonically sorted") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val nYears = li.select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).as("yr")).distinct()
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Relational.q113(spark, sf).collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val entries = r.getAs[String]("multimap").split('|')
      assert(entries.length == r.getAs[Int]("n_keys"))
      var prevKey = ""
      entries.foreach { e =>
        val Array(key, vs) = e.split(':')
        assert(key > prevKey, "keys must be sorted"); prevKey = key
        val vals = vs.stripPrefix("[").stripSuffix("]").split(',').map(_.toLong)
        // a true multimap: one value per ship year, not a collapsed map
        assert(vals.length == nYears((flag, key)).toInt, e)
        assert(vals.sameElements(vals.sorted), s"values must be sorted: $e")
      }
    }
  }

  test("s07 recursive CTE: every nation reached at its binary-heap depth") {
    val rows = GraftCli.queries("s07_sql_recursive")(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/nation.parquet").count()
    assert(rows.length == n, "recursion must reach every node exactly once")
    rows.foreach { r =>
      val k = r.getAs[Number]("n_nationkey").longValue
      val expectedDepth = if (k == 0) 0 else (63 - java.lang.Long.numberOfLeadingZeros(k + 1))
      assert(r.getAs[Int]("depth") == expectedDepth, r.toString)
      val path = r.getAs[String]("path").split('>').map(_.toLong)
      assert(path.head == 0 && path.last == k && path.length == expectedDepth + 1)
    }
  }

  test("s11 TPC-H Q3 as SQL text equals the q129 DataFrame plan row for row") {
    val want = graft.operators.Relational.q129(spark, sf).collect().toSeq
    val got = GraftCli.queries("s11_sql_tpch")(spark, sf).collect().toSeq
    assert(got == want)
  }

  test("s08 lateral: top-2 nations per region match a direct recomputation") {
    val rows = GraftCli.queries("s08_sql_lateral")(spark, sf).collect()
    val perNation = spark.sql("""
      SELECT r_name, n_name, COUNT(*) AS n_cust
      FROM region JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      GROUP BY r_name, n_name""").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (region, rs) =>
      assert(rs.length <= 2, s"$region: LIMIT 2 inside LATERAL must bound rows")
      val expected = perNation.collect { case ((reg, nat), c) if reg == region => (nat, c) }
        .toSeq.sortBy { case (nat, c) => (-c, nat) }.take(rs.length)
      val got = rs.map(r => (r.getAs[String]("n_name"), r.getAs[Long]("n_cust"))).toSeq
      assert(got.sorted == expected.sorted, s"$region: $got vs $expected")
    }
  }
}
