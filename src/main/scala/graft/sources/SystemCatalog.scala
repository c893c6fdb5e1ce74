package graft.sources

import java.util
import java.util.concurrent.ConcurrentLinkedDeque
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.{CaseInsensitiveStringMap, QueryExecutionListener}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The `system` catalog — Presto's cluster-introspection surface
 * (`system.runtime.nodes`, `system.runtime.queries`) served as a DSv2
 * [[TableCatalog]]. The reference's `status` command reports cluster
 * name + worker count (presto-mgr.py:159-169 — `PrestoCoordinator
 * .status` / `PrestoMetaManager.status`); Presto users get the same
 * information — and per-query history — by SELECTing these tables, so
 * graft serves the spellings verbatim:
 *
 *   SELECT * FROM system.runtime.nodes    -- one row per live executor
 *   SELECT * FROM system.runtime.queries  -- recent query history
 *
 * Wired by `spark.sql.catalog.system=graft.sources.GraftSystemCatalog`
 * (GraftSession default), so the tables resolve in the CLI, in
 * programmatic sessions, AND in every GraftServer thrift connection.
 *
 * Both tables are tiny driver-state snapshots (executor list, bounded
 * query log), so they plan as [[LocalScan]] — a driver-local batch, no
 * distributed job, the right physical shape for metadata at any cluster
 * size.
 */
class GraftSystemCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName = "system"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private val Runtime = Array("runtime")

  override def listNamespaces(): Array[Array[String]] = Array(Runtime)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(Runtime)
    else if (namespace.sameElements(Runtime)) Array.empty
    else throw new IllegalArgumentException(
      s"[$catalogName] no such namespace: ${namespace.mkString(".")}")

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(Runtime)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new IllegalArgumentException(
      s"[$catalogName] no such namespace: ${namespace.mkString(".")}")

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Runtime))
      Array(Identifier.of(Runtime, "nodes"), Identifier.of(Runtime, "queries"))
    else throw new IllegalArgumentException(
      s"[$catalogName] no such namespace: ${namespace.mkString(".")}")

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.sameElements(Runtime) && ident.name == "nodes")
      new SystemTable(s"$catalogName.runtime.nodes", GraftSystemCatalog.NodesSchema,
        () => GraftSystemCatalog.nodeRows())
    else if (ident.namespace.sameElements(Runtime) && ident.name == "queries")
      new SystemTable(s"$catalogName.runtime.queries", GraftSystemCatalog.QueriesSchema,
        () => GraftSystemCatalog.queryRows())
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      Seq(catalogName) ++ ident.namespace ++ Seq(ident.name))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")
  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(s"$catalogName catalog is read-only")
}

/** A read-only snapshot table: rows computed ON THE DRIVER at scan-build
  * time, planned as a LocalScan (LocalTableScanExec — no job). */
private[sources] class SystemTable(tableName: String, tableSchema: StructType,
                                   rowsFn: () => Array[InternalRow])
  extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = rowsFn()
        override def readSchema(): StructType = tableSchema
        override def description(): String = tableName
      }
    }
}

object GraftSystemCatalog {

  /** Presto system.runtime.nodes columns (0.248), mapped onto the Spark
    * cluster: node_id = executor host:port, coordinator = the driver. */
  val NodesSchema: StructType = StructType(Seq(
    StructField("node_id", StringType, nullable = false),
    StructField("http_uri", StringType, nullable = false),
    StructField("node_version", StringType, nullable = false),
    StructField("coordinator", BooleanType, nullable = false),
    StructField("state", StringType, nullable = false)))

  def nodeRows(): Array[InternalRow] = {
    val spark = SparkSession.active
    val sc = spark.sparkContext
    // the driver appears in the executor list; in Presto's vocabulary it
    // IS the coordinator (the reference's PrestoCoordinator actor) —
    // identified by the driver block manager's host:port
    val driverBm = org.apache.spark.SparkEnv.get.blockManager.blockManagerId
    sc.statusTracker.getExecutorInfos.map { info =>
      val id = s"${info.host()}:${info.port()}"
      val isDriver = info.host() == driverBm.host && info.port() == driverBm.port
      InternalRow(
        UTF8String.fromString(id),
        UTF8String.fromString(s"spark://$id"),
        UTF8String.fromString(sc.version),
        isDriver,
        UTF8String.fromString("active"))
    }
  }

  /** Presto system.runtime.queries (0.248 core columns): bounded recent
    * query history from a QueryExecutionListener. */
  val QueriesSchema: StructType = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("state", StringType, nullable = false),
    StructField("query", StringType, nullable = false),
    StructField("elapsed_ms", LongType, nullable = false),
    StructField("error", StringType, nullable = true)))

  private val MaxLog = 200
  private final case class Entry(id: Long, state: String, query: String,
                                 elapsedMs: Long, error: String)
  private val log = new ConcurrentLinkedDeque[Entry]()
  private val ids = new AtomicLong()
  @volatile private var installed: Set[SparkSession] = Set.empty

  /** Register the query-history listener once per session (GraftCli.open
    * / GraftServer.start call this; idempotent). */
  def installLog(spark: SparkSession): Unit = synchronized {
    if (!installed.contains(spark)) {
      installed += spark
      spark.listenerManager.register(new QueryExecutionListener {
        private def describe(qe: QueryExecution): String = {
          // SQL-parsed plans carry their original statement in the tree
          // Origin (Presto's queries.query column verbatim); DataFrame-
          // built plans have no text, so fall back to a bounded plan
          // descriptor
          val fromOrigin = (qe.logical +: qe.logical.children)
            .flatMap(p => p.origin.sqlText).headOption
          fromOrigin.map(_.take(200)).getOrElse {
            val head = qe.analyzed.nodeName
            val cols = qe.analyzed.output.map(_.name).take(8).mkString(", ")
            s"$head [$cols]".take(200)
          }
        }
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          record("FINISHED", describe(qe), durationNs / 1000000, null)
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit =
          record("FAILED", describe(qe), 0L,
            Option(exception.getMessage).getOrElse("").take(200))
      })
    }
  }

  private def record(state: String, query: String, elapsedMs: Long,
                     error: String): Unit = {
    log.addFirst(Entry(ids.incrementAndGet(), state, query, elapsedMs, error))
    while (log.size() > MaxLog) log.pollLast()
  }

  def queryRows(): Array[InternalRow] =
    log.iterator().asScala.map { e =>
      InternalRow(
        UTF8String.fromString(s"graft_${e.id}"),
        UTF8String.fromString(e.state),
        UTF8String.fromString(e.query),
        e.elapsedMs,
        if (e.error == null) null else UTF8String.fromString(e.error))
    }.toArray
}
