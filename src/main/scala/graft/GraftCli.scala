package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.sources.Tables

/**
 * SQL front door — the reference's primary user experience is a SQL prompt
 * (presto-mgr.py `connect`/`cli`; README.md:90–96
 * `presto:test> select * from user;`). This is the Spark-native equivalent:
 * register the catalog as temp views, install the graft function family,
 * and serve SQL text.
 *
 * Usage:
 *   runMain graft.GraftCli <sfDir> "SELECT ...;" ["SELECT ...;" ...]
 *   runMain graft.GraftCli <sfDir> -f script.sql   # ;-terminated statements
 *   runMain graft.GraftCli <sfDir>          # REPL: reads ;-terminated
 *                                           # statements from stdin
 *                                           # (under sbt prefer argv/-f:
 *                                           # sbt does not reliably forward
 *                                           # stdin to the forked JVM)
 */
object GraftCli {

  /** One session wired for SQL text: all tables as views + graft functions
    * registered. The same wiring a JDBC/Thrift deployment would do once. */
  def open(spark: SparkSession, sfDir: String): SparkSession = {
    Tables.registerAll(spark, sfDir)
    GraftFunctions.install(spark)
    spark
  }

  /** Execute one SQL statement (the programmatic front door). */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame =
    open(spark, sfDir).sql(text)

  /** Split ;-terminated SQL statements, leaving semicolons inside
    * single-quoted literals alone ('' quote escaping falls out naturally:
    * the escaped quote closes and immediately reopens string mode). */
  private[graft] def splitStatements(in: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inStr = false
    in.foreach { c =>
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case ';'  => out += cur.toString; cur.clear()
        case _    => cur += c
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Resolve the statement source from the CLI arguments (after sfDir):
    * `-f <script>` reads ;-terminated statements from the file (and
    * rejects a missing/extra operand or unreadable file with a clear
    * message BEFORE any work happens), bare arguments are statements
    * themselves, no arguments means the stdin REPL. Pulled out of main so
    * the arg handling is unit-testable without a session. */
  private[graft] def statementsFrom(args: Array[String]): Iterator[String] =
    if (args.length > 1 && args(1) == "-f") {
      if (args.length != 3) throw new IllegalArgumentException(
        "usage: GraftCli <sfDir> -f <script.sql>  (exactly one script file)")
      val p = java.nio.file.Paths.get(args(2))
      if (!java.nio.file.Files.isReadable(p)) throw new IllegalArgumentException(
        s"GraftCli: script file not found or unreadable: ${args(2)}")
      splitStatements(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")).iterator
    } else if (args.length > 1) args.iterator.drop(1)
    else {
      // stdin REPL: statements are ;-terminated, like the reference's CLI
      splitStatements(scala.io.Source.stdin.mkString).iterator
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.error("usage: GraftCli <sfDir> [-f script.sql | sql...]"))
    val statements = try statementsFrom(args) catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage)
        sys.exit(2)
    }
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
    open(spark, sfDir)
    statements.foreach { stmt =>
      try spark.sql(stmt.stripSuffix(";")).show(100, truncate = false)
      catch { case e: Exception =>
        System.err.println(s"[graft-cli] error: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  /** Inventory entries exercised THROUGH the SQL-text path (same driver
    * oracle discipline as the DataFrame entries): proves a reference user
    * can point SQL at this engine and get verified answers. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_sql_agg" -> ((s, d) => sql(s, d, """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),
    "s02_sql_join" -> ((s, d) => sql(s, d, """
      SELECT n_name, COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")),
    "s03_sql_window" -> ((s, d) => sql(s, d, """
      SELECT o_custkey, o_orderkey,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders WHERE o_custkey < 50
      ORDER BY o_custkey, rn""")),
    "s04_sql_cte" -> ((s, d) => sql(s, d, """
      WITH spend AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5)
      SELECT c_custkey, c_name, total, n_orders
      FROM spend JOIN customer ON c_custkey = o_custkey
      ORDER BY total DESC, c_custkey LIMIT 25""")),
    "s05_sql_graft_fn" -> ((s, d) => sql(s, d, """
      SELECT a.vec_id,
        round(cosine_sim(a.embedding, b.embedding), 4) AS sim_next
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      ORDER BY a.vec_id"""))
  )

  /** DuckDB oracles for the SQL-text entries. */
  val oracles: Map[String, String] = Map(
    "s01_sql_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "s02_sql_join" -> """
      SELECT n_name, COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "s03_sql_window" -> """
      SELECT o_custkey, o_orderkey,
        CAST(row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
      FROM orders WHERE o_custkey < 50
      ORDER BY o_custkey, rn""",
    "s04_sql_cte" -> """
      WITH spend AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5)
      SELECT c_custkey, c_name, total, n_orders
      FROM spend JOIN customer ON c_custkey = o_custkey
      ORDER BY total DESC, c_custkey LIMIT 25""",
    "s05_sql_graft_fn" -> """
      SELECT a.vec_id,
        round(list_dot_product(ea, eb) /
              (sqrt(list_dot_product(ea, ea)) * sqrt(list_dot_product(eb, eb))), 4)
          AS sim_next
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ea FROM embeddings) a
      JOIN (SELECT vec_id AS vb, CAST(embedding AS DOUBLE[]) AS eb FROM embeddings) b
        ON b.vb = a.vec_id + 1
      ORDER BY a.vec_id"""
  )
}
