package graft.sources

import java.util
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedDeque}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.{CaseInsensitiveStringMap, QueryExecutionListener}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The `system` catalog — Presto's cluster-introspection surface
 * (`system.runtime.nodes` / `queries` / `tasks`, and the
 * `system.runtime.kill_query` procedure) served as a read-only DSv2
 * [[TableCatalog]] + [[ProcedureCatalog]]. The reference's `status`
 * command reports cluster name + worker count (presto-mgr.py:159-169);
 * Presto users get the same information — plus live query/task state and
 * an admin kill switch — through these spellings, so graft serves them
 * verbatim:
 *
 *   SELECT * FROM system.runtime.nodes    -- one row per live executor
 *   SELECT * FROM system.runtime.queries  -- RUNNING + recent history
 *   SELECT * FROM system.runtime.tasks    -- active stages (Presto tasks)
 *   CALL system.runtime.kill_query('id')  -- cancel that query's jobs
 *
 * Wired by `spark.sql.catalog.system=graft.sources.GraftSystemCatalog`
 * (GraftSession default), so everything resolves in the CLI, in
 * programmatic sessions, AND in every GraftServer thrift connection.
 *
 * RUNNING visibility: every CLI/server statement runs under a JOB GROUP
 * — the CLI tags statements itself ([[GraftSystemCatalog.beginStatement]]
 * → `setJobGroup(query_id, sql, interruptOnCancel=true)`), and Spark's
 * thrift operations tag theirs with their statement UUID — and a
 * context-wide SparkListener surfaces any grouped job as a RUNNING row,
 * so a SECOND connection watching system.runtime.queries sees in-flight
 * statements, Presto's exact workflow for finding the id to kill.
 * kill_query routes to `SparkContext.cancelJobGroup` (tasks interrupted),
 * so the victim statement fails with the cancellation and lands in the
 * history as FAILED.
 *
 * All three tables are driver-state snapshots (executor list, bounded
 * query log, statusTracker stage info), so they plan as [[LocalScan]] —
 * a driver-local batch, no distributed job, the right physical shape for
 * metadata at any cluster size.
 */
class GraftSystemCatalog extends TableCatalog with SupportsNamespaces
  with ProcedureCatalog {

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
      Array(Identifier.of(Runtime, "nodes"), Identifier.of(Runtime, "queries"),
        Identifier.of(Runtime, "tasks"))
    else throw new IllegalArgumentException(
      s"[$catalogName] no such namespace: ${namespace.mkString(".")}")

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.sameElements(Runtime) && ident.name == "nodes")
      new SystemTable(s"$catalogName.runtime.nodes", GraftSystemCatalog.NodesSchema,
        () => GraftSystemCatalog.nodeRows())
    else if (ident.namespace.sameElements(Runtime) && ident.name == "queries")
      new SystemTable(s"$catalogName.runtime.queries", GraftSystemCatalog.QueriesSchema,
        () => GraftSystemCatalog.queryRows())
    else if (ident.namespace.sameElements(Runtime) && ident.name == "tasks")
      new SystemTable(s"$catalogName.runtime.tasks", GraftSystemCatalog.TasksSchema,
        () => GraftSystemCatalog.taskRows())
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      Seq(catalogName) ++ ident.namespace ++ Seq(ident.name))

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    if (ident.namespace.sameElements(Runtime) &&
        ident.name.equalsIgnoreCase("kill_query"))
      new KillQueryProcedure
    else throw new IllegalArgumentException(
      s"[$catalogName] no such procedure: ${ident.namespace.mkString(".")}.${ident.name}")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Runtime))
      Array(Identifier.of(Runtime, "kill_query"))
    else Array.empty

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

/** Presto's `CALL system.runtime.kill_query(query_id)` — the admin kill
  * switch. Routes to `SparkContext.cancelJobGroup(query_id)` with task
  * interruption; the victim statement fails with the cancellation and
  * the history shows FAILED. Returns one row acknowledging the kill. */
private[sources] class KillQueryProcedure extends UnboundProcedure {
  override def name(): String = "kill_query"
  override def description(): String =
    "Kill the query running under the given query_id (job group)"
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "kill_query"
    override def description(): String = KillQueryProcedure.this.description()
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("query_id", StringType).build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val id = input.getUTF8String(0).toString
      val msg = GraftSystemCatalog.killQuery(id)
      val schema = StructType(Seq(StructField("result", StringType, nullable = false)))
      util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow(UTF8String.fromString(msg)))
        override def readSchema(): StructType = schema
        override def description(): String = "kill_query"
      }).iterator()
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

  // -------------------------------------------------------------- queries

  /** Presto system.runtime.queries (0.248 core columns): RUNNING
    * statements (job-group tracked) + bounded recent history. `user` and
    * `started` added in r19 (Presto's columns of the same names). */
  val QueriesSchema: StructType = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("state", StringType, nullable = false),
    StructField("user", StringType, nullable = false),
    StructField("query", StringType, nullable = false),
    StructField("started", TimestampType, nullable = false),
    StructField("elapsed_ms", LongType, nullable = false),
    StructField("error", StringType, nullable = true)))

  private val MaxLog = 200
  private final case class Entry(id: String, state: String, user: String,
                                 query: String, startedMs: Long,
                                 elapsedMs: Long, error: String)
  private val log = new ConcurrentLinkedDeque[Entry]()
  private val ids = new AtomicLong()

  /** In-flight statements/jobs, keyed by job group (query_id). `begun` =
    * explicitly opened by [[beginStatement]] (removed only by
    * [[endStatement]]); listener-discovered groups (e.g. thrift
    * statement UUIDs) are removed when their last job ends. */
  private final class Running(val id: String, @volatile var query: String,
                              val user: String, val startedMs: Long,
                              val begun: Boolean) {
    val activeJobs = new AtomicInteger(0)
  }
  private val running = new ConcurrentHashMap[String, Running]()
  /** jobId → job group, for tasks-view stage attribution. */
  private val jobGroups = new ConcurrentHashMap[Int, String]()

  /** Sessions with the query-history listener installed — WEAK refs: a
    * stopped/garbage session must not be pinned by this registry (r18
    * ADVICE; the listener itself dies with the session's listener
    * manager). */
  private val installed: util.Set[SparkSession] =
    util.Collections.synchronizedSet(
      util.Collections.newSetFromMap(new util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  /** Contexts with the job-group listener installed (weak, same bound). */
  private val contextsInstalled: util.Set[SparkContext] =
    util.Collections.synchronizedSet(
      util.Collections.newSetFromMap(new util.WeakHashMap[SparkContext, java.lang.Boolean]()))

  /** Register the query-history + job-group listeners once per session /
    * context (GraftCli.open / GraftServer.start call this; idempotent). */
  def installLog(spark: SparkSession): Unit = synchronized {
    if (installed.add(spark)) {
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
    val sc = spark.sparkContext
    if (contextsInstalled.add(sc)) {
      sc.addSparkListener(new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val group = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          group.foreach { g =>
            val desc = Option(e.properties.getProperty("spark.job.description"))
              .getOrElse("").take(200)
            val r = running.computeIfAbsent(g, _ =>
              new Running(g, desc, sc.sparkUser, System.currentTimeMillis(),
                begun = false))
            if (r.query.isEmpty && desc.nonEmpty) r.query = desc
            r.activeJobs.incrementAndGet()
            jobGroups.put(e.jobId, g)
          }
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit =
          Option(jobGroups.remove(e.jobId)).foreach { g =>
            val r = running.get(g)
            // listener-discovered groups vanish with their last job;
            // begun statements stay RUNNING until endStatement
            if (r != null && r.activeJobs.decrementAndGet() <= 0 && !r.begun)
              running.remove(g, r)
          }
      })
    }
  }

  /** Open a statement-scoped query_id: RUNNING row + job group (tasks
    * under it are attributable and killable). The caller MUST
    * [[endStatement]] in a finally. */
  def beginStatement(spark: SparkSession, sql: String): String = {
    val id = s"graft_${ids.incrementAndGet()}"
    running.put(id, new Running(id, sql.take(200), spark.sparkContext.sparkUser,
      System.currentTimeMillis(), begun = true))
    spark.sparkContext.setJobGroup(id, sql.take(200), interruptOnCancel = true)
    id
  }

  /** Close a statement-scoped query_id (the FINISHED/FAILED history row
    * comes from the QueryExecutionListener, as for every execution). */
  def endStatement(spark: SparkSession, id: String): Unit = {
    running.remove(id)
    spark.sparkContext.clearJobGroup()
  }

  /** Cancel all jobs in the query's group (tasks interrupted). The
    * victim's own failure lands it in the history as FAILED. */
  def killQuery(id: String): String = {
    val r = running.get(id)
    if (r == null) throw new IllegalArgumentException(
      s"kill_query: no running query with id '$id' " +
        "(SELECT query_id FROM system.runtime.queries WHERE state = 'RUNNING')")
    SparkSession.active.sparkContext.cancelJobGroup(id)
    record("KILLED", r.query, System.currentTimeMillis() - r.startedMs,
      "killed via system.runtime.kill_query")
    s"killed $id"
  }

  private def record(state: String, query: String, elapsedMs: Long,
                     error: String): Unit = {
    log.addFirst(Entry(s"graft_${ids.incrementAndGet()}", state,
      Option(SparkSession.getActiveSession).flatten
        .map(_.sparkContext.sparkUser)
        .getOrElse(System.getProperty("user.name", "unknown")),
      query, System.currentTimeMillis() - elapsedMs, elapsedMs, error))
    while (log.size() > MaxLog) log.pollLast()
  }

  def queryRows(): Array[InternalRow] = {
    val now = System.currentTimeMillis()
    val runningRows = running.values().asScala.toSeq.sortBy(-_.startedMs).map { r =>
      InternalRow(
        UTF8String.fromString(r.id),
        UTF8String.fromString("RUNNING"),
        UTF8String.fromString(r.user),
        UTF8String.fromString(r.query),
        r.startedMs * 1000L,
        now - r.startedMs,
        null)
    }
    val finished = log.iterator().asScala.map { e =>
      InternalRow(
        UTF8String.fromString(e.id),
        UTF8String.fromString(e.state),
        UTF8String.fromString(e.user),
        UTF8String.fromString(e.query),
        e.startedMs * 1000L,
        e.elapsedMs,
        if (e.error == null) null else UTF8String.fromString(e.error))
    }
    (runningRows ++ finished).toArray
  }

  // ---------------------------------------------------------------- tasks

  /** Presto system.runtime.tasks (core columns), mapped onto Spark's
    * stage model: one row per stage of an ACTIVE job, splits = Spark
    * tasks, query_id = the job group when the job has one. Served off
    * `statusTracker` — driver-local metadata, no job. */
  val TasksSchema: StructType = StructType(Seq(
    StructField("node_id", StringType, nullable = false),
    StructField("task_id", StringType, nullable = false),
    StructField("stage_id", IntegerType, nullable = false),
    StructField("query_id", StringType, nullable = true),
    StructField("state", StringType, nullable = false),
    StructField("splits", IntegerType, nullable = false),
    StructField("queued_splits", IntegerType, nullable = false),
    StructField("running_splits", IntegerType, nullable = false),
    StructField("completed_splits", IntegerType, nullable = false)))

  def taskRows(): Array[InternalRow] = {
    val sc = SparkSession.active.sparkContext
    val tracker = sc.statusTracker
    val driverBm = org.apache.spark.SparkEnv.get.blockManager.blockManagerId
    val nodeId = s"${driverBm.host}:${driverBm.port}"
    tracker.getActiveJobIds().flatMap { jobId =>
      val group = jobGroups.get(jobId)
      tracker.getJobInfo(jobId).toSeq.flatMap(_.stageIds().flatMap { stageId =>
        tracker.getStageInfo(stageId).map { s =>
          val queued = math.max(0,
            s.numTasks() - s.numActiveTasks() - s.numCompletedTasks() - s.numFailedTasks())
          InternalRow(
            UTF8String.fromString(nodeId),
            UTF8String.fromString(s"$stageId.${s.currentAttemptId()}"),
            stageId,
            if (group == null) null else UTF8String.fromString(group),
            UTF8String.fromString(if (s.numActiveTasks() > 0) "RUNNING" else "SCHEDULED"),
            s.numTasks(),
            queued,
            s.numActiveTasks(),
            s.numCompletedTasks())
        }
      })
    }
  }
}
