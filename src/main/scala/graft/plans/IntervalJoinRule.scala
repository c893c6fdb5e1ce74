package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/**
 * Rewrites a pure point-in-interval join into a bucketed equi-join.
 *
 * The natural way to write "event inside a window" —
 * `probe.join(intervals, ts >= lo && ts < hi)` — has no equi-conjunct, so
 * Spark can only plan a BroadcastNestedLoopJoin (or a cartesian): an O(n·m)
 * scan that at 100 TB simply never finishes. This is one of the most common
 * silent scale traps in Spark SQL. The rule detects the shape and injects
 * the quantized-bucket topology (the same one
 * [[graft.operators.RangeJoin]] builds by hand): intervals explode to their
 * covering coarse time buckets, the probe computes its single bucket, the
 * bucket equality becomes a hash-join key, and the ORIGINAL predicate stays
 * as the exact residual filter. Correctness is unchanged — every (probe,
 * interval) pair satisfying the predicate shares the probe's bucket — and
 * the plan becomes a shuffle hash/sort-merge join.
 *
 * Scope is deliberately strict (the rule runs inside the fixed-point
 * operator-optimization batch, so it must be idempotent and must never
 * misfire): INNER joins whose condition is exactly two conjuncts
 * `ts >= lo AND ts < hi` (or `<=`), `ts` a TimestampType column of one
 * side, `lo`/`hi` TimestampType columns of the other. Anything with an
 * equi-conjunct already hash-joins and is left alone; the rewritten join
 * has an equi-conjunct, so the rule cannot re-fire on its own output.
 *
 * Bucket width is [[BucketSeconds]] (1 hour): intervals spanning W seconds
 * explode to ceil(W/3600)+1 rows — bounded fan-out for bounded windows,
 * exactly like RangeJoin's manual form.
 */
object IntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSeconds = 3600L

  /** Max interval span (in buckets) eligible for the bucketed rewrite —
    * one leap year of hourly buckets. Wider (open-ended / sentinel)
    * intervals keep the original nested-loop shape instead of exploding
    * to unbounded bucket rows; see the wide arm below. */
  val MaxSpanBuckets = 8784L

  /** floor(epoch-seconds / bucket) of a timestamp expression. */
  private def bucket(ts: Expression): Expression =
    IntegralDivide(Cast(ts, LongType), Literal(BucketSeconds))

  /** True when nothing anywhere in the subtree can change between
    * executions: no nondeterministic expression on any node, and no
    * Sample (a seeded sample is still partition-order-dependent, so two
    * executions of the same Sample plan may keep different rows). The
    * rewrite below emits a Union whose two arms each re-execute the
    * probe and intervals subtrees INDEPENDENTLY — if either subtree is
    * nondeterministic, a row's interval span can differ between the
    * narrow-arm and wide-arm evaluations, duplicating or dropping
    * matches relative to the original single join. Such plans keep
    * their original shape. */
  private def planDeterministic(p: LogicalPlan): Boolean =
    !p.exists {
      case _: Sample => true
      case n => n.expressions.exists(e => !e.deterministic)
    }

  private def isTs(e: Expression): Boolean = e.dataType == TimestampType

  /** (probeTs, lo, hi) if the two conjuncts form ts >= lo AND ts < hi with
    * ts from `probe` and lo/hi from `intervals`. */
  private def matchRange(conjuncts: Seq[Expression], probe: LogicalPlan,
                         intervals: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromProbe(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(probe.outputSet) && e.deterministic
    def fromIntervals(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(intervals.outputSet) && e.deterministic
    conjuncts match {
      case Seq(a, b) =>
        val lower = Seq(a, b).collectFirst {
          case GreaterThanOrEqual(ts, lo) if fromProbe(ts) && fromIntervals(lo) && isTs(ts) => (ts, lo)
          case LessThanOrEqual(lo, ts) if fromProbe(ts) && fromIntervals(lo) && isTs(ts) => (ts, lo)
        }
        val upper = Seq(a, b).collectFirst {
          case LessThan(ts, hi) if fromProbe(ts) && fromIntervals(hi) && isTs(ts) => (ts, hi)
          case LessThanOrEqual(ts, hi) if fromProbe(ts) && fromIntervals(hi) && isTs(ts) => (ts, hi)
          case GreaterThan(hi, ts) if fromProbe(ts) && fromIntervals(hi) && isTs(ts) => (ts, hi)
          case GreaterThanOrEqual(hi, ts) if fromProbe(ts) && fromIntervals(hi) && isTs(ts) => (ts, hi)
        }
        for {
          (ts, lo) <- lower
          (ts2, hi) <- upper
          if ts.semanticEquals(ts2)
        } yield (ts, lo, hi)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !j.isStreaming &&
          hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
          planDeterministic(left) && planDeterministic(right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // try (left=probe, right=intervals) then the mirror
      val hit = matchRange(conjuncts, left, right).map((_, true))
        .orElse(matchRange(conjuncts, right, left).map((_, false)))
      hit match {
        case Some(((ts, lo, hi), probeIsLeft)) =>
          val (probe, intervals) = if (probeIsLeft) (left, right) else (right, left)
          val pBucket = Alias(bucket(ts), "__graft_pbucket")()
          val probeProj = Project(probe.output :+ pBucket, probe)
          val iBucketAttr = AttributeReference("__graft_ibucket", LongType, nullable = false)()
          val lob = bucket(lo)
          val hib = bucket(hi)
          val span = Subtract(hib, lob)

          // NARROW arm — intervals of bounded span take the bucketed path.
          // The malformed shape (hi < lo) matches nothing under the
          // original predicate; Sequence with a positive step would THROW
          // on it instead — emit an empty bucket list so behavior stays
          // identical to the nested-loop plan. (Null bounds are excluded
          // by the arm filters: null span passes neither.)
          val narrow = Filter(And(And(IsNotNull(lob), IsNotNull(hib)),
            LessThanOrEqual(span, Literal(MaxSpanBuckets))), intervals)
          val buckets = If(LessThanOrEqual(lob, hib),
            // Sequence is TimeZoneAware — it must carry a zone id or the
            // plan we emit is unresolved (long inputs never consult it)
            Sequence(lob, hib, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
            Literal.create(Array.empty[Long],
              org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
          val gen = Generate(
            Explode(buckets),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(iBucketAttr), child = narrow)
          val newCond = And(EqualTo(pBucket.toAttribute, iBucketAttr), cond)
          val (nl, nr) =
            if (probeIsLeft) (probeProj, gen) else (gen, probeProj)
          val bucketed =
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))

          // WIDE arm — open-ended/sentinel intervals (validity until
          // 9999-12-31 is routine) would explode to millions of bucket
          // rows, turning a slow-but-finishing nested loop into an OOM.
          // Those rare rows keep the original join shape. The empty
          // HintInfo is load-bearing: this rule skips hinted joins, so it
          // cannot re-fire on its own wide arm inside the fixed point
          // (a bare marker conjunct would be pushed out of the condition
          // by PushPredicateThroughJoin and re-expose the pattern).
          val wideFilter = Filter(GreaterThan(span, Literal(MaxSpanBuckets)), intervals)
          val (wl, wr) =
            if (probeIsLeft) (probe, wideFilter) else (wideFilter, probe)
          val wide = Project(j.output,
            Join(wl, wr, Inner, Some(cond), JoinHint(Some(HintInfo()), None)))

          Union(Seq(bucketed, wide))
        case None => j
      }
  }
}
