package graft

import graft.operators.TpchSql

/** The s23 discipline: every TPC-H SQL text must equal its DataFrame
  * twin ROW-FOR-ROW (values, column names, and presentation order) —
  * the same pin s11 carries for Q3. A text that drifts from its twin
  * in an alias, a decimal scale, or a tie-break key fails here before
  * it can fail the shared-oracle hash at the gate. */
class TpchSqlSpec extends GraftSpec {

  private lazy val twins = SparkEntry.queries

  for ((name, twin, text) <- TpchSql.texts if twin.nonEmpty) {
    test(s"$name text == $twin DataFrame row-for-row") {
      val viaSql = GraftCli.sql(spark, sf, text)
      val viaDf = twins(twin)(spark, sf)
      assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
        s"column mismatch: ${viaSql.columns.mkString(",")} vs ${viaDf.columns.mkString(",")}")
      val a = viaSql.collect().map(_.toString).toSeq
      val b = viaDf.collect().map(_.toString).toSeq
      assert(a == b, s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
        .find { case (x, y) => x != y }}")
    }
  }

  test("s23_tpch_q02 (no twin): qualifying parts carry their region-minimum acctbal") {
    val rows = GraftCli.sql(spark, sf,
      TpchSql.texts.find(_._1 == "s23_tpch_q02").get._3).collect()
    // every reported (part, supplier) pair must be a genuine lineitem
    // association and the acctbal must be the MIN among that part's
    // EUROPE suppliers — recompute brute-force
    val df = GraftCli.sql(spark, sf, """
      SELECT p_partkey, MIN(s_acctbal) AS m
      FROM part, supplier, lineitem, nation, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND p_size = 15 AND p_type LIKE '%STANDARD%'
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
      GROUP BY p_partkey""").collect()
      .map(r => r.getLong(0) -> r.getDouble(0 + 1)).toMap
    assert(rows.nonEmpty, "q02 must select at least one part at sf0.001")
    rows.foreach { r =>
      val (bal, pk) = (r.getDouble(0), r.getLong(3))
      assert(df(pk) == bal, s"part $pk: reported $bal, true min ${df(pk)}")
    }
    // presentation order is total and as specified
    val key = rows.map(r => (-r.getDouble(0), r.getString(2), r.getString(1), r.getLong(3)))
    assert(key.sameElements(key.sorted), "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey")
  }
}
