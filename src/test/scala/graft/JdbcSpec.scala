package graft

import org.apache.spark.sql.functions._
import graft.sources.Formats

/**
 * Live JDBC round-trip: the reference's demonstrated connector is a JDBC
 * database (mysql.properties). No network DB exists in this container, but
 * the Spark distribution ships Apache Derby — an embedded JDBC engine —
 * so the JDBC source path is exercised end-to-end against a real driver:
 * write through Spark's jdbc sink, read back through Formats.Jdbc with a
 * sharded (partitionColumn) scan, and check filter pushdown to the DB.
 */
class JdbcSpec extends GraftSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC source round-trips through embedded Derby with a partitioned read") {
    val src = (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    src.write.format("jdbc")
      .option("url", url).option("dbtable", "people")
      .mode("overwrite").save()

    val jdbc = Formats.Jdbc(url, "people", user = "app", password = "",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    val got = jdbc.load(spark)
    // the scan must actually shard: 4 concurrent range-queries, not 1 task
    assert(got.rdd.getNumPartitions == 4)
    assert(got.count() == 100)
    val total = got.agg(sum($"score")).head().getDouble(0)
    assert(math.abs(total - (1 to 100).map(_ * 1.5).sum) < 1e-9)
  }

  test("JDBC predicate pushes down to the database, not a post-filter scan") {
    val jdbc = Formats.Jdbc(url, "people", user = "app", password = "")
    val filtered = jdbc.load(spark).filter($"id" <= 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"filter must reach the JDBC scan:\n$plan")
    assert(filtered.count() == 10)
  }

  test("MySQL dialect: resolution, quoting, and the SQL text Spark would send") {
    // The reference's one configured connector is MySQL
    // (mysql.properties: connector.name=mysql + connection-url). No MySQL
    // server exists on this image, but the DIALECT — the layer that
    // decides identifier quoting, type DDL, and pushed-predicate SQL
    // text — is pure driver-side code, testable without a socket. The
    // Derby round-trip above exercises the identical reader/pushdown
    // machinery; this pins the MySQL-specific SQL generation so the
    // mysql.properties deployment claim rests on more than Derby.
    import org.apache.spark.sql.jdbc.JdbcDialects
    val d = JdbcDialects.get("jdbc:mysql://db.example.com:3306/warehouse")
    assert(d.getClass.getName.contains("MySQLDialect"),
      s"mysql:// URL must resolve the MySQL dialect, got ${d.getClass}")
    assert(JdbcDialects.get(url).getClass != d.getClass,
      "the Derby URL must NOT resolve to the MySQL dialect")
    // identifiers quote with backticks, embedded backticks double
    assert(d.quoteIdentifier("o_orderkey") == "`o_orderkey`")
    assert(d.quoteIdentifier("o_order`key") == "`o_order``key`")
    // literals in pushed predicates escape MySQL-style
    assert(d.compileValue("O'Brien") == "'O''Brien'")
    assert(d.compileValue(java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
      == "'2024-01-02 03:04:05.0'")
    // paging + existence-probe + truncate statements
    assert(d.getLimitClause(7) == "LIMIT 7")
    assert(d.getSchemaQuery("orders") == "SELECT * FROM orders WHERE 1=0")
    assert(d.getTruncateQuery("orders") == "TRUNCATE TABLE orders")
  }

  test("MySQL dialect: type mapping both directions") {
    import java.sql.Types
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val d = JdbcDialects.get("jdbc:mysql://db.example.com:3306/warehouse")
    // outbound (Catalyst -> MySQL column DDL): the writer's CREATE TABLE
    def ddl(t: DataType): String = d.getJDBCType(t).get.databaseTypeDefinition
    assert(ddl(StringType) == "LONGTEXT")   // not VARCHAR: unbounded strings
    assert(ddl(BooleanType) == "BIT(1)")
    assert(ddl(ByteType) == "TINYINT")
    assert(ddl(ShortType) == "SMALLINT")
    assert(ddl(LongType) == "BIGINT")
    assert(ddl(FloatType) == "FLOAT")
    assert(ddl(DoubleType) == "DOUBLE PRECISION")
    assert(ddl(BinaryType) == "BLOB")
    // inbound (MySQL result metadata -> Catalyst): unsigned types widen
    // one notch so max values don't overflow the signed Catalyst type
    def cat(sqlType: Int, name: String, size: Int, signed: Boolean) =
      d.getCatalystType(sqlType, name, size,
        new MetadataBuilder().putBoolean("isSigned", signed))
    assert(cat(Types.TINYINT, "TINYINT", 3, signed = true).contains(ByteType))
    assert(cat(Types.TINYINT, "TINYINT", 3, signed = false).contains(ShortType))
    assert(cat(Types.SMALLINT, "SMALLINT", 5, signed = true).contains(ShortType))
    assert(cat(Types.SMALLINT, "SMALLINT", 5, signed = false).contains(IntegerType))
    // MySQL BIT(n>1) surfaces as bytes
    assert(cat(Types.BIT, "BIT", 2, signed = true).contains(BinaryType))
    // dialect defers common types (INT/BIGINT/VARCHAR) to the shared
    // JDBC mapping — None means "no MySQL-specific override"
    assert(cat(Types.INTEGER, "INT", 10, signed = true).isEmpty)
    assert(cat(Types.VARCHAR, "VARCHAR", 64, signed = true).isEmpty)
  }
}
