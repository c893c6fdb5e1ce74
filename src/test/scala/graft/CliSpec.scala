package graft

/** SQL front door: the reference's primary UX (a SQL prompt) served by
  * GraftCli — tables registered as views, graft functions callable. */
class CliSpec extends GraftSpec {

  test("front door serves plain SQL over the registered catalog") {
    val rows = GraftCli.sql(spark, sf,
      "SELECT r_name FROM region ORDER BY r_name").collect()
    assert(rows.length == 5)
  }

  test("front door exposes graft native functions to SQL text") {
    val r = GraftCli.sql(spark, sf,
      "SELECT round(cosine_sim(embedding, embedding), 4) AS s " +
        "FROM embeddings LIMIT 1").head()
    assert(r.getDouble(0) == 1.0)
  }

  test("statement splitter respects quoted literals and '' escapes") {
    assert(GraftCli.splitStatements("SELECT 1; SELECT 2;") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(GraftCli.splitStatements("SELECT 'a;b' AS x; SELECT 'it''s; fine'") ==
      Seq("SELECT 'a;b' AS x", "SELECT 'it''s; fine'"))
    assert(GraftCli.splitStatements("  ;;  ") == Seq.empty)
  }

  test("SHOW TABLES / DESCRIBE work through the SQL front door (catalog parity)") {
    val tables = GraftCli.sql(spark, sf, "SHOW TABLES")
      .collect().map(_.getAs[String]("tableName")).toSet
    assert(Set("lineitem", "orders", "customer", "documents", "embeddings")
      .subsetOf(tables), s"missing tables in $tables")
    val cols = GraftCli.sql(spark, sf, "DESCRIBE lineitem")
      .collect().map(_.getString(0)).toSet
    assert(cols.contains("l_orderkey") && cols.contains("l_quantity"))
  }

  test("EXPLAIN works through the SQL front door (reference CLI parity)") {
    val plan = GraftCli.sql(spark, sf,
      "EXPLAIN SELECT n_name, count(*) FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name")
      .head().getString(0)
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("HashAggregate"))
  }

  test("-f script mode reads statements and rejects bad invocations clearly") {
    val f = java.nio.file.Files.createTempFile("cli", ".sql")
    java.nio.file.Files.write(f,
      "SELECT 1;\nSELECT 'a;b' AS x;\n".getBytes("UTF-8"))
    val stmts = GraftCli.statementsFrom(Array("sf", "-f", f.toString)).toSeq
    assert(stmts == Seq("SELECT 1", "SELECT 'a;b' AS x"))
    // argv mode unchanged
    assert(GraftCli.statementsFrom(Array("sf", "SELECT 2")).toSeq == Seq("SELECT 2"))
    // -f with no operand / extra operands / missing file -> clear errors,
    // not a fall-through that executes "-f" as SQL
    intercept[IllegalArgumentException](GraftCli.statementsFrom(Array("sf", "-f")))
    intercept[IllegalArgumentException](
      GraftCli.statementsFrom(Array("sf", "-f", f.toString, "extra.sql")))
    intercept[IllegalArgumentException](
      GraftCli.statementsFrom(Array("sf", "-f", "/nonexistent/x.sql")))
  }

  test("all s-entries run through the SQL-text path and return rows") {
    GraftCli.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).limit(1).count() == 1, s"$name returned no rows")
    }
    assert(GraftCli.queries.keySet == GraftCli.oracles.keySet)
  }
}
