package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/**
 * Canonical physical-plan fingerprint for regression pinning.
 *
 * The inventory's plans are the product being graded: a broadcast that
 * silently becomes a shuffle, a pruned scan that starts reading every
 * column, or a hash join that degrades to a nested loop is invisible to
 * a correctness oracle (same rows, 100× the cost at scale) — exactly the
 * class of regression a Spark upgrade or a conf/rule change introduces.
 * This digest renders the pre-execution physical plan as a small stable
 * tree of the SCALE-RELEVANT facts only:
 *
 *   - the operator class (SortMergeJoinExec vs BroadcastHashJoinExec vs
 *     BroadcastNestedLoopJoinExec is the whole story for joins),
 *   - join type and build side,
 *   - exchange partitioning SHAPE (hash/range/single — but not the
 *     partition COUNT, which is a tuning conf, not a plan property),
 *   - scan output width (column-pruning tripwire).
 *
 * Everything volatile — expression ids, statistics, file paths, codegen
 * stage ids, partition counts — is excluded, so the digest is identical
 * across machines and sessions at the same data layout and only moves
 * when the plan's structure moves. PlanManifestSpec pins every inventory
 * entry's digest against the committed PLAN_MANIFEST.txt.
 */
object PlanDigest {

  /** The initial physical plan: what the planner chose before AQE starts
    * re-writing at runtime (pre-execution, AdaptiveSparkPlanExec still
    * holds its initial plan — runtime re-plans are a feature, not drift,
    * so the pin is on the static decision). */
  def canonical(df: DataFrame): String = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      sb.append("  " * depth).append(describe(p)).append('\n')
      p.children.foreach(walk(_, depth + 1))
      // scalar/IN subqueries hang off expressions, not children — their
      // plans regress just as silently (a subquery broadcast flip)
      p.subqueries.foreach { sq =>
        sb.append("  " * (depth + 1)).append("Subquery:\n")
        walk(sq, depth + 2)
      }
    }
    walk(root, 0)
    sb.toString
  }

  private def describe(p: SparkPlan): String = p match {
    case j: BroadcastHashJoinExec => s"BroadcastHashJoinExec(${j.joinType},build=${j.buildSide})"
    case j: ShuffledHashJoinExec => s"ShuffledHashJoinExec(${j.joinType},build=${j.buildSide})"
    case j: SortMergeJoinExec => s"SortMergeJoinExec(${j.joinType})"
    case j: BroadcastNestedLoopJoinExec => s"BroadcastNestedLoopJoinExec(${j.joinType})"
    case e: ShuffleExchangeExec =>
      s"ShuffleExchangeExec(${e.outputPartitioning.getClass.getSimpleName})"
    case s: org.apache.spark.sql.execution.FileSourceScanExec =>
      s"FileSourceScanExec[cols=${s.output.length}]"
    case _ => p.getClass.getSimpleName
  }
}
