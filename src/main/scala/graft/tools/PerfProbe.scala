package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/**
 * Per-entry driver/executor time split for the optimization loop
 * (guide §1/§7.3): for each named entry, separately times
 *
 *   build  — calling the entry fn (DataFrame construction; analysis cost
 *            for eagerly-analyzed parts),
 *   plan   — forcing queryExecution.executedPlan (optimizer + physical
 *            planning + codegen source generation; driver-side,
 *            single-threaded — the §7.3 "nothing is running" bucket),
 *   exec   — toRdd.count() (job execution, the bench's timed action).
 *
 * Each phase is measured on the steady-state pass (one warm run first, so
 * janino/JIT warmup stays out of the numbers, matching Bench's protocol).
 * Usage: SPARK_GRAFT_PROBE_ONLY=a13_ivfpq_recall,q10_percentile
 *        sbt "runMain graft.tools.PerfProbe"
 */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.get(s"local[$cpus]", cpus.toInt)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(',').toSet)
    SparkEntry.queries("q01_agg_groupby")(spark, sfDir).queryExecution.toRdd.count()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    println(f"${"entry"}%-24s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      def s(a: Long, b: Long): Double = (b - a) / 1e9
      println(f"$name%-24s ${s(t0, t1)}%8.3f ${s(t1, t2)}%8.3f ${s(t2, t3)}%8.3f ${s(t0, t3)}%8.3f")
    }
    spark.stop()
  }
}
