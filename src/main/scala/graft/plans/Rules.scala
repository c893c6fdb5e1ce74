package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.Hamming64

/**
 * Catalyst optimizer rules for the graft expression family.
 *
 * SelfHammingRule: hamming64(x, x) ≡ 0 for any deterministic x (x XOR x is
 * always 0), so the per-row popcount — and potentially the evaluation of x
 * itself — folds to a literal. This shape appears when dedup pipelines join
 * candidate tables back to themselves and compare signatures.
 */
object SelfHammingRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Hamming64(a, b) if a.deterministic && a.semanticEquals(b) =>
      Literal(0, IntegerType)
  }
}

object Rules {
  /** Attach graft optimizer rules to an existing session (the
    * SparkSessionExtensions path in GraftExtensions covers new sessions). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SelfHammingRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfHammingRule
    }
}
