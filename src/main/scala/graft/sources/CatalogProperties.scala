package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{GraftBridge, SparkSession}

/**
 * Presto-style catalog configuration: a directory of `*.properties`
 * files, one per catalog, each naming a connector and its connection
 * settings — the reference's connector-config model (presto-mgr.py:14
 * `CATALOG_PATH`, mysql.properties:1-3 `connector.name=mysql` /
 * `connection-url` / `connection-user` / `connection-password`). A
 * Presto user drops `mysql.properties` into the catalog dir and runs
 * `SELECT * FROM mysql.db.t`; graft serves the identical workflow by
 * wiring each JDBC-family properties file to Spark's own
 * `JDBCTableCatalog` under the file's name, so three-part names,
 * `SHOW CATALOGS`, and `SHOW SCHEMAS FROM <catalog>` work verbatim.
 *
 * Served connectors (all map onto JDBCTableCatalog — Spark's DSv2 JDBC
 * catalog, with per-dialect pushdown):
 *   - `mysql`, `postgresql`, `sqlserver` — driver class inferred;
 *   - `jdbc` — generic (any DriverManager-resolvable URL; optional
 *     `connection-driver` names the class explicitly).
 * Anything else (hive, kafka, ...) is REFUSED per-file with a clear
 * reason — the session still starts, matching Presto's behavior of a
 * catalog failing to register without killing the server.
 *
 * Scale posture: the catalog is METADATA plumbing — each query against
 * a wired catalog plans through Spark's JDBC source (predicate/column
 * pushdown into the remote database, partitioned reads via the usual
 * JDBC options), so the 100 TB posture is whatever the remote engine
 * serves; nothing materializes on the driver at wire time.
 */
object CatalogProperties {

  final case class Wired(name: String, connector: String, url: String)
  final case class Refused(file: String, reason: String)

  /** Connector names served, with their (inferred) driver class; None =
    * let DriverManager resolve from the URL (ServiceLoader-registered
    * drivers like Derby's need no explicit class). */
  private val Connectors: Map[String, Option[String]] = Map(
    "mysql" -> Some("com.mysql.cj.jdbc.Driver"),
    "postgresql" -> Some("org.postgresql.Driver"),
    "sqlserver" -> Some("com.microsoft.sqlserver.jdbc.SQLServerDriver"),
    "jdbc" -> None)

  /** Names a wired catalog may not shadow. */
  private val Reserved = Set("system", "spark_catalog", "session")

  private[graft] def parseFile(file: Path): Map[String, String] = {
    val props = new java.util.Properties()
    val in = Files.newInputStream(file)
    try props.load(in) finally in.close()
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k)).toMap
  }

  /** The spark confs one properties file wires (pure — unit-testable
    * without a session). Left = refusal reason. */
  private[graft] def confsFor(name: String, props: Map[String, String])
      : Either[String, (Map[String, String], Wired)] = {
    if (!name.matches("[a-zA-Z_][a-zA-Z0-9_]*"))
      return Left(s"catalog name '$name' is not a valid identifier")
    if (Reserved.contains(name.toLowerCase(java.util.Locale.ROOT)))
      return Left(s"catalog name '$name' shadows a built-in catalog")
    val connector = props.getOrElse("connector.name",
      return Left("missing connector.name"))
    val driverDefault = Connectors.getOrElse(connector.toLowerCase(java.util.Locale.ROOT),
      return Left(s"connector.name=$connector is not served " +
        s"(served: ${Connectors.keys.toSeq.sorted.mkString(", ")})"))
    val url = props.getOrElse("connection-url",
      return Left("missing connection-url"))
    val base = s"spark.sql.catalog.$name"
    val confs = Map(
      base -> "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
      s"$base.url" -> url) ++
      props.get("connection-user").map(s"$base.user" -> _) ++
      props.get("connection-password").map(s"$base.password" -> _) ++
      props.get("connection-driver").orElse(driverDefault).map(s"$base.driver" -> _)
    Right((confs, Wired(name, connector, url)))
  }

  /** Wire every `*.properties` file under `dir`: set the catalog confs
    * on the session AND on the SparkContext's conf (so GraftServer's
    * per-connection `newSession()` state — which rebuilds SQLConf from
    * the context conf — sees the catalogs too), then force-load each
    * catalog so `SHOW CATALOGS` lists it immediately. A file that fails
    * to parse, names an unserved connector, or whose catalog plugin
    * fails to initialize (e.g. a mysql URL with no MySQL driver jar on
    * the classpath — this image's documented environment block) is
    * reported in `refused` without killing the session; its confs stay
    * set when initialization was the failing step, so a later statement
    * against it gets the same error statement-scoped. */
  def wire(spark: SparkSession, dir: String): (Seq[Wired], Seq[Refused]) = {
    val d = Paths.get(dir)
    require(Files.isDirectory(d), s"catalog dir not found: $dir")
    val files = Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".properties")).toSeq
      .sortBy(_.getFileName.toString)
    val wired = Seq.newBuilder[Wired]
    val refused = Seq.newBuilder[Refused]
    files.foreach { f =>
      val name = f.getFileName.toString.stripSuffix(".properties")
      val parsed = try Right(parseFile(f)) catch {
        case e: Exception => Left(s"unreadable properties file: ${e.getMessage}")
      }
      parsed.flatMap(confsFor(name, _)) match {
        case Left(reason) => refused += Refused(f.toString, reason)
        case Right((confs, w)) =>
          confs.foreach { case (k, v) =>
            spark.conf.set(k, v)
            GraftBridge.setContextConf(spark, k, v)
          }
          try { GraftBridge.loadCatalog(spark, w.name); wired += w }
          catch { case e: Exception =>
            refused += Refused(f.toString,
              s"catalog '${w.name}' failed to initialize (left wired; " +
                s"statements against it will see this error): " +
                Option(e.getMessage).getOrElse(e.toString).take(200))
          }
      }
    }
    (wired.result(), refused.result())
  }

  /** Wire-and-report: the CLI/server boot path (stderr lines, Presto's
    * catalog-load log shape). */
  def wireReporting(spark: SparkSession, dir: String,
                    err: java.io.PrintStream): Unit = {
    val (wired, refused) = wire(spark, dir)
    wired.foreach(w => err.println(
      s"[graft] catalog ${w.name} (connector ${w.connector}) -> ${w.url}"))
    refused.foreach(r => err.println(s"[graft] catalog REFUSED ${r.file}: ${r.reason}"))
  }
}
