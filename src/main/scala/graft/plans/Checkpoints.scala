package graft.plans

import org.apache.spark.sql.DataFrame

/**
 * Conf-switchable plan staging for the four deliberate materialization
 * points (q115/e13 leaf sketches, q126's per-doc maps, p05's
 * range-placed corpus — each documented at its site and in SURVEY §4).
 *
 * Default `localCheckpoint()`: executor-local blocks, no distributed-FS
 * round trip — right for the common case, but a lost executor between
 * materialization and consumption fails that job (clean rerun). A
 * churn-heavy deployment (spot fleets, aggressive scale-in) sets
 *
 *   spark.graft.checkpoint.reliable = true
 *   spark.sparkContext.setCheckpointDir("hdfs://...")   // or any shared FS
 *
 * and the same sites write reliable `checkpoint()`s instead: blocks on
 * the shared FS survive executor loss, so the job rides through kills at
 * the cost of one FS write per staged frame. The flip is invisible to
 * results AND to the plan digest (both modes scan an already-computed
 * RDD; the pin is on the logical staging point, not the storage tier).
 */
object Checkpoints {

  /** Session conf: "true" switches the staged sites from localCheckpoint
    * to reliable checkpoint(). */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Materialize `df` eagerly at the mode the session conf selects. */
  def stage(df: DataFrame): DataFrame = stage(df, "staged")

  /** [[stage]] with a caller-chosen manifest label — callers that may
    * serve the staged frame from a cache on later calls (Ann's ground
    * truths) record the SAME label on both paths, keeping the manifest
    * independent of cache state. */
  def stage(df: DataFrame, label: String): DataFrame = {
    val spark = df.sparkSession
    // manifest audit: the plan that materializes here is invisible
    // downstream (consumers see an RDD scan) — record it as a side plan
    // so PLAN_MANIFEST stays the audit of record (no-op outside
    // PlanManifestSpec)
    PlanDigest.recordSidePlan(label, df)
    val reliable = spark.conf.getOption(ReliableConf).exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true needs spark.sparkContext.setCheckpointDir " +
          "(a shared filesystem all executors can reach)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
