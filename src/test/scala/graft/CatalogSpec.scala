package graft

import java.nio.file.{Files, Path}
import java.sql.DriverManager

import graft.sources.CatalogProperties

/** Presto-style catalog `*.properties` front door (reference
  * CATALOG_PATH + mysql.properties): each JDBC-family file wires to a
  * named Spark JDBCTableCatalog, proven LIVE against an embedded-Derby
  * database — wire, SHOW CATALOGS, SHOW SCHEMAS FROM, three-part-name
  * reads, pushed-filter reads, and per-file refusals. */
class CatalogSpec extends GraftSpec {

  private def catalogDir(entries: (String, String)*): Path = {
    val d = Files.createTempDirectory("graft-catalog")
    entries.foreach { case (name, body) =>
      Files.write(d.resolve(s"$name.properties"), body.getBytes("UTF-8"))
    }
    d
  }

  /** One in-memory Derby database with a GRAFT.PEOPLE table. */
  private def derbyUrl(db: String): String = {
    val url = s"jdbc:derby:memory:$db;create=true"
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE SCHEMA GRAFT")
      st.execute("CREATE TABLE GRAFT.PEOPLE (ID INT NOT NULL, NAME VARCHAR(20))")
      st.execute("INSERT INTO GRAFT.PEOPLE VALUES (1, 'ada'), (2, 'grace'), (3, 'edsger')")
      st.close()
    } finally c.close()
    url
  }

  test("a derby-backed properties file wires to a live queryable catalog") {
    val url = derbyUrl("graftcat1")
    val dir = catalogDir(
      "derbycat" -> s"""connector.name=jdbc
        |connection-url=$url
        |connection-driver=org.apache.derby.jdbc.EmbeddedDriver
        |""".stripMargin,
      // the reference's own mysql.properties shape — no mysqld/driver in
      // this image, so it must be REFUSED at load (initialize fails on
      // the missing driver class) without killing the session, and the
      // message must say why
      "mysql" -> """connector.name=mysql
        |connection-url=jdbc:mysql://localhost:3306
        |connection-user=yyz
        |connection-password=123456
        |""".stripMargin,
      "kafkaish" -> "connector.name=kafka\nbroker=localhost:9092\n",
      "noname" -> "connection-url=jdbc:derby:memory:x\n")
    val (wired, refused) = CatalogProperties.wire(spark, dir.toString)
    assert(wired.map(_.name) == Seq("derbycat"), wired.toString)
    assert(refused.size == 3, refused.toString)
    assert(refused.exists(r => r.file.contains("kafkaish") &&
      r.reason.contains("not served")), refused.toString)
    assert(refused.exists(r => r.file.contains("noname") &&
      r.reason.contains("connector.name")), refused.toString)
    assert(refused.exists(_.file.contains("mysql")), refused.toString)

    // Presto's catalog surface: SHOW CATALOGS lists the wired name
    val cats = spark.sql("SHOW CATALOGS").collect().map(_.getString(0)).toSet
    assert(cats.contains("derbycat"), cats.toString)
    // SHOW SCHEMAS FROM <catalog> hits the remote metadata
    val schemas = spark.sql("SHOW SCHEMAS FROM derbycat")
      .collect().map(_.getString(0)).toSet
    assert(schemas.exists(_.equalsIgnoreCase("GRAFT")), schemas.toString)

    // three-part-name read through the front door, values live from Derby
    val rows = GraftCli.sql(spark, sf,
      "SELECT ID, NAME FROM derbycat.GRAFT.PEOPLE ORDER BY ID").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "ada"), (2, "grace"), (3, "edsger")))

    // pushed-filter read: the predicate reaches the remote scan
    val filtered = spark.sql(
      "SELECT NAME FROM derbycat.GRAFT.PEOPLE WHERE ID > 1")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"), plan)
    assert(filtered.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("edsger", "grace"))

    // statements against the refused-but-wired mysql catalog fail
    // statement-scoped (the documented environment block), session alive
    intercept[Exception](
      spark.sql("SELECT * FROM mysql.db.t").collect())
    assert(spark.sql("SELECT 1").collect().head.getInt(0) == 1)
  }

  test("confsFor maps the reference's properties shape; reserved names refused") {
    val Right((confs, w)) = CatalogProperties.confsFor("mysql", Map(
      "connector.name" -> "mysql",
      "connection-url" -> "jdbc:mysql://localhost:3306",
      "connection-user" -> "yyz",
      "connection-password" -> "123456")): @unchecked
    assert(w.connector == "mysql")
    assert(confs("spark.sql.catalog.mysql")
      .endsWith("jdbc.JDBCTableCatalog"))
    assert(confs("spark.sql.catalog.mysql.url") == "jdbc:mysql://localhost:3306")
    assert(confs("spark.sql.catalog.mysql.user") == "yyz")
    assert(confs("spark.sql.catalog.mysql.password") == "123456")
    assert(confs("spark.sql.catalog.mysql.driver") == "com.mysql.cj.jdbc.Driver")
    // reserved / invalid names refuse
    assert(CatalogProperties.confsFor("system",
      Map("connector.name" -> "jdbc", "connection-url" -> "u")).isLeft)
    assert(CatalogProperties.confsFor("bad-name",
      Map("connector.name" -> "jdbc", "connection-url" -> "u")).isLeft)
    // missing url refuses
    assert(CatalogProperties.confsFor("x",
      Map("connector.name" -> "jdbc")).swap.exists(_.contains("connection-url")))
  }
}
