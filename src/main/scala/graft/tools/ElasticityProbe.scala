package graft.tools

import graft.GraftSession

/**
 * Live scale-UP evidence for the elasticity surface (r17 verdict task 6).
 *
 * The reference's core cluster claim is imperative worker add/remove
 * (presto-mgr.py:177-181 `add_worker` / `del_worker`); graft maps it to
 * Spark dynamic allocation ([[GraftSession.elasticityConfs]]). The
 * scale-DOWN half has kill-run evidence (executors retire under shuffle
 * tracking); this probe observes the scale-UP half LIVE: a
 * `local-cluster[2, 2, …]` mini-standalone cluster starts with
 * `initialExecutors=1`, a wide shuffle job builds a task backlog, and the
 * allocation manager must request the second executor
 * (`schedulerBacklogTimeout=2s`).
 *
 * Prints machine-checkable lines (`[elasticity] initial=… max=… grew=…`);
 * SessionSpec shells this main into its own JVM (local-cluster needs to
 * own the context) and asserts on them.
 */
object ElasticityProbe {

  def main(args: Array[String]): Unit = {
    // executor JVMs are separate processes: they need the same JDK-17
    // add-opens the driver gets from build.sbt/graft_java.sh
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = GraftSession.get(
      master = "local-cluster[2, 2, 1536]",
      shufflePartitions = 64,
      extraConfs = GraftSession.elasticityConfs(
        minWorkers = 1, maxWorkers = 2, initialWorkers = 1) ++ Map(
        "spark.dynamicAllocation.schedulerBacklogTimeout" -> "2s",
        "spark.dynamicAllocation.sustainedSchedulerBacklogTimeout" -> "2s",
        "spark.executor.memory" -> "1g",
        "spark.executor.cores" -> "2",
        "spark.executor.extraJavaOptions" -> addOpens))
    val sc = spark.sparkContext
    def liveExecutors(): Int =
      sc.statusTracker.getExecutorInfos.count(_.host() != null) - 1 // minus driver
    // wait for the INITIAL allocation to register, so `initial` measures
    // the configured floor, not the registration race
    val regDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (liveExecutors() < 1 && System.nanoTime() < regDeadline)
      Thread.sleep(250)
    val initial = liveExecutors()
    println(s"[elasticity] initial=$initial")

    // wide job: enough tasks (64 partitions, CPU-bound enough) that the
    // single 2-core initial executor leaves a SUSTAINED backlog past the
    // 2s scheduler-backlog timeout
    @volatile var maxSeen = initial
    val job = new Thread(() => {
      val n = spark.range(0, 400000000L, 1, 64)
        .selectExpr("id % 997 AS k", "id")
        .groupBy("k").agg(org.apache.spark.sql.functions.expr(
          "sum(id * 2654435761) AS s")).count()
      println(s"[elasticity] job rows=$n")
    })
    job.start()
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (job.isAlive && System.nanoTime() < deadline) {
      maxSeen = math.max(maxSeen, liveExecutors())
      Thread.sleep(250)
    }
    job.join(180000)
    maxSeen = math.max(maxSeen, liveExecutors())
    println(s"[elasticity] max=$maxSeen grew=${maxSeen > initial}")
    spark.stop()
  }
}
