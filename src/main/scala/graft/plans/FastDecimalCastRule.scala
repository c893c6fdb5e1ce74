package graft.plans

import org.apache.spark.QueryContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.types._

/**
 * Fast double→decimal cast: same values, same nulls, same errors as
 * Spark's `Cast(double, DecimalType(p, s))`, an order of magnitude less
 * per-row cost on clean numeric data.
 *
 * Why: Spark's cast goes through `BigDecimal.valueOf(d)` — i.e.
 * `new BigDecimal(Double.toString(d))` — per ROW (shortest-decimal
 * rendering, string parse, setScale). The exact-decimal aggregation
 * discipline this engine uses everywhere (`CAST(SUM(CAST(x AS
 * DECIMAL(18,s))) AS DOUBLE)`, SURVEY §5) puts that conversion inside
 * every monetary aggregate's inner loop; measured at sf0.1 it is ~2/3 of
 * q01's scan-stage time (guide §1.2 "per-task work": `sum(double)` 0.45 s
 * vs `sum(cast(double as decimal))` 0.74 s over the same 600k rows).
 *
 * Fast path: a candidate unscaled long `r ≈ round(d·10^s)` is accepted
 * ONLY if `(double)(r) / 10^s == d` — i.e. the s-digit decimal r·10⁻ˢ
 * rounds (IEEE nearest) back to exactly this double. When that holds and
 * |d| is under a scale-aware magnitude bound, r·10⁻ˢ is the UNIQUE
 * s-digit decimal identifying d (decimal spacing 10⁻ˢ is ≫ 2·ulp(d)
 * under the bound), and Spark's shortest-repr S satisfies |S − r·10⁻ˢ| ≤
 * ulp(d) < 0.5·10⁻ˢ, so `setScale(s, HALF_UP)` of S is exactly r·10⁻ˢ —
 * the fast result equals the slow result digit for digit. The float
 * product `d·10^s` carries < 0.5 absolute error under the bound, so the
 * true candidate is one of {round−1, round, round+1}; all three are
 * tried. Anything else — halfway values (1.005), |d| beyond the bound,
 * subnormals, NaN/Infinity, precision overflow — falls through to the
 * VERBATIM Spark slow path (same `BigDecimal.valueOf` conversion, same
 * `changePrecision`, same ANSI error / LEGACY null, same
 * NumberFormatException→null for non-finite input), so equivalence is by
 * construction, not by data assumption. FastDecimalCastSpec pins
 * value-for-value agreement with the built-in cast across adversarial
 * domains.
 *
 * The magnitude bound min(2·10¹⁵, 10^p/2)/10^s guarantees, in one check:
 * ulp(d) < 0.5·10⁻ˢ (uniqueness), |r| < 2⁵³ (exact long→double), and
 * digits(r) ≤ p (no overflow on the fast path).
 */
case class FastDoubleToDecimal(
    child: Expression,
    precision: Int,
    scale: Int,
    ansi: Boolean,
    queryContext: Option[QueryContext])
  extends UnaryExpression {

  override def dataType: DataType = DecimalType(precision, scale)

  override def nullable: Boolean = true

  override def prettyName: String = "fast_decimal_cast"

  // exact powers of ten as doubles (scale ≤ 6 enforced by the rule)
  private val pow: Double = math.pow(10, scale)
  private val bound: Double = math.min(2.0e15, math.pow(10, precision) / 2.0) / pow

  private def slowPath(d: Double): Any =
    // Interpreted fallback: delegate to Spark's own Cast on the value
    // (QueryExecutionErrors is private[sql], so the generated-code path
    // below spells the slow branch out verbatim while this one reuses
    // Cast wholesale — identical values/nulls/errors either way).
    Cast(Literal(d, DoubleType), DecimalType(precision, scale), None,
      if (ansi) EvalMode.ANSI else EvalMode.LEGACY).eval(InternalRow.empty)

  override protected def nullSafeEval(in: Any): Any = {
    val d = in.asInstanceOf[Double]
    val ad = if (d < 0) -d else d
    if (ad <= bound) {
      val r = Math.round(d * pow)
      if (r.toDouble / pow == d) return Decimal.createUnsafe(r, precision, scale)
      if ((r - 1).toDouble / pow == d) return Decimal.createUnsafe(r - 1, precision, scale)
      if ((r + 1).toDouble / pow == d) return Decimal.createUnsafe(r + 1, precision, scale)
    }
    slowPath(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val r = ctx.freshName("r")
      val done = ctx.freshName("done")
      val tmp = ctx.freshName("tmpDec")
      val dec = "org.apache.spark.sql.types.Decimal"
      val overflow = if (ansi) {
        val errCtx = ctx.addReferenceObj("errCtx", queryContext.orNull,
          classOf[QueryContext].getName)
        s"""throw org.apache.spark.sql.errors.QueryExecutionErrors
           |  .cannotChangeDecimalPrecisionError($tmp, $precision, $scale, $errCtx);"""
          .stripMargin
      } else s"${ev.isNull} = true;"
      s"""
         |boolean $done = false;
         |if (($d < 0 ? -$d : $d) <= ${bound}D) {
         |  long $r = Math.round($d * ${pow}D);
         |  if (((double) $r) / ${pow}D == $d) {
         |    ${ev.value} = $dec.createUnsafe($r, $precision, $scale); $done = true;
         |  } else if (((double) ($r - 1L)) / ${pow}D == $d) {
         |    ${ev.value} = $dec.createUnsafe($r - 1L, $precision, $scale); $done = true;
         |  } else if (((double) ($r + 1L)) / ${pow}D == $d) {
         |    ${ev.value} = $dec.createUnsafe($r + 1L, $precision, $scale); $done = true;
         |  }
         |}
         |if (!$done) {
         |  try {
         |    $dec $tmp = $dec.apply(scala.math.BigDecimal.valueOf($d));
         |    if ($tmp.changePrecision($precision, $scale)) {
         |      ${ev.value} = $tmp;
         |    } else {
         |      $overflow
         |    }
         |  } catch (java.lang.NumberFormatException e) {
         |    ${ev.isNull} = true;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): FastDoubleToDecimal =
    copy(child = c)
}

/**
 * Swaps eligible `Cast(double AS decimal(p, s))` for
 * [[FastDoubleToDecimal]] — the per-task-work optimization (guide §1.2)
 * behind every decimal-exact monetary aggregate, applied at the optimizer
 * so BOTH the DataFrame entries (`dsum`/`davg`) and the SQL-text front
 * door (`CAST(... AS DECIMAL(18,6))` in s01/s23/...) get it from one
 * place.
 *
 * Scope (must never misfire; the batch is fixed-point, and the rewrite
 * cannot re-match its own output): double input; scale ≤ 6 (exact
 * double powers + the uniqueness bound above); precision ≤ 18 (compact
 * longs); ANSI or LEGACY eval mode — TRY keeps the built-in cast (its
 * error-to-null wrapping is outside the replicated semantics).
 */
object FastDecimalCastRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case c @ Cast(child, dt: DecimalType, _, mode)
        if child.dataType == DoubleType && dt.scale >= 0 && dt.scale <= 6 &&
          dt.precision <= 18 && mode != EvalMode.TRY =>
      FastDoubleToDecimal(child, dt.precision, dt.scale,
        ansi = mode == EvalMode.ANSI, Option(c.getContextOrNull()))
  }
}
