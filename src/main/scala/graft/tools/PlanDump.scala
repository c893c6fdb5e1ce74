package graft.tools

import graft.{GraftSession, SparkEntry}

/**
 * Writes `explain("formatted")` for the named entries to
 * `<outDir>/<entry>_<suffix>.txt` — the optimization round's plan
 * evidence (the plans/r19 _before/_after txt files).
 *
 * Usage:
 *   sbt "runMain graft.tools.PlanDump /root/repo/plans/r19 after q01_agg_groupby,a13_ivfpq_recall"
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <entry,entry,...>")
    val Array(outDir, suffix, names) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(',').foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), text)
      println(s"wrote $name")
    }
    spark.stop()
  }
}
