package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Optimizer rule: rewrite an inner theta RANGE join
  * (`point ≥/> lo AND point ≤/< hi` — closed, open, or half-open; point
  * from one side, bounds from the other) into a bin-synthesized
  * EQUI-join — the automation of
  * `q_join_range_binned`'s hand-written shape, expressed as a
  * `Rule[LogicalPlan]` so a user writing the declarative BETWEEN join
  * gets the scalable plan without knowing the trick.
  *
  * Why this matters at 100 TB: Catalyst has no equi-key to hash on in a
  * pure range join, so it plans BroadcastNestedLoopJoin — O(|L|·|R|) and
  * a driver OOM the moment neither side broadcasts. With a bin key on
  * both sides the planner hash-partitions both inputs, and each pair is
  * examined only within its bin.
  *
  * Correctness of the rewrite:
  *   - the POINT side computes ONE bin: floor(point / w);
  *   - the INTERVAL side explodes every bin its [lo, hi] overlaps;
  *   - point ∈ [lo, hi]  ⇒  bin(point) ∈ bins([lo, hi]), and the
  *     interval side emits each of its bins EXACTLY once ⇒ every
  *     matching pair meets on exactly one bin row — no duplicates, no
  *     dedup pass needed;
  *   - the ORIGINAL range predicate is re-applied in the join condition,
  *     so bin co-residency never admits a false pair;
  *   - an empty interval (lo > hi) explodes zero bins (guarded — Spark's
  *     `sequence(a, b)` would DESCEND for a > b);
  *   - a NULL point/bound produced no match before (three-valued range
  *     predicate) and produces none after (its bin is NULL: the equi-join
  *     drops it).
  *
  * Scope guards (each bails to the untouched plan):
  *   - inner joins only, with the range pair on LONG-typed columns;
  *   - only when the condition has NO equi-conjunct already (if one
  *     exists Catalyst hash-joins on it and the range rides as a
  *     post-join filter — binning would only add work);
  *   - extra non-range conjuncts are preserved in the rewritten join
  *     condition;
  *   - OPT-IN via `spark.graft.rangeJoin.binWidth` (unset/non-positive ⇒
  *     rule is a no-op). Bin width tuning is workload knowledge (≈ the
  *     typical interval length): too narrow multiplies the interval
  *     side's explode factor, too wide degrades toward per-bin nested
  *     loops — the same trade the manual shape documents.
  *
  * Registered through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) — the extensions entry point — and appendable
  * to a live session via `spark.experimental.extraOptimizations`.
  */
object RangeBinJoinRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  /** Per-row explode guard: an interval spanning more bins than this
    * means the configured width is implausibly small for the data (4M
    * bin rows from ONE interval is already pathological, and past
    * Spark's max array length the synthesized Sequence would throw an
    * opaque error mid-query). The rewrite cannot silently CAP the bins —
    * truncation would drop matches — so the guard turns the failure into
    * an actionable message naming the conf to raise. */
  private[graft] val MaxBinsPerRow = 4000000L

  private def binWidth: Option[Long] = {
    val v = try conf.getConfString(ConfKey, "") catch { case _: Throwable => "" }
    if (v.isEmpty) None
    else scala.util.Try(v.trim.toLong).toOption.filter(_ > 0) match {
      case ok @ Some(_) => ok
      case None =>
        // a malformed opt-in must be LOUD: silently no-op'ing the rule
        // hands the user the nested-loop plan they opted out of
        logWarning(s"$ConfKey='$v' is not a positive long; " +
          "range-bin join rewrite disabled")
        None
    }
  }

  /** floor(expr / w) as LONG — Floor over a double divide is exact for
    * |expr| < 2^52 and, unlike integral division, floors (not truncates)
    * on negatives, so bin boundaries are consistent across zero. */
  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  private case class RangePair(point: Expression, lo: Expression, hi: Expression)

  /** Split a conjunction, find a (point ≥/> lo, point ≤/< hi) pair with
    * `point` from `pointSide` and both bounds from `boundSide`. Strict
    * bounds are fine for BINNING (the strict interval is a subset of the
    * closed one, so closed-bound bin coverage is a superset) — the
    * ORIGINAL predicates are kept verbatim in the rewritten condition,
    * so strictness is enforced exactly where it was before. */
  private def extractRange(
      cond: Expression,
      pointSide: LogicalPlan,
      boundSide: LogicalPlan): Option[RangePair] = {
    def fromPoint(e: Expression) = e.references.subsetOf(pointSide.outputSet) && e.references.nonEmpty
    def fromBound(e: Expression) = e.references.subsetOf(boundSide.outputSet) && e.references.nonEmpty
    val conjuncts = splitConjunctivePredicates(cond)
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, lo)
          if fromPoint(p) && fromBound(lo) && p.dataType == LongType => (p, lo)
      case GreaterThan(p, lo)
          if fromPoint(p) && fromBound(lo) && p.dataType == LongType => (p, lo)
      case LessThanOrEqual(lo, p)
          if fromPoint(p) && fromBound(lo) && p.dataType == LongType => (p, lo)
      case LessThan(lo, p)
          if fromPoint(p) && fromBound(lo) && p.dataType == LongType => (p, lo)
    }
    lower.flatMap { case (p, lo) =>
      val upper = conjuncts.collectFirst {
        case LessThanOrEqual(p2, hi) if p2.semanticEquals(p) && fromBound(hi) => hi
        case LessThan(p2, hi) if p2.semanticEquals(p) && fromBound(hi) => hi
        case GreaterThanOrEqual(hi, p2) if p2.semanticEquals(p) && fromBound(hi) => hi
        case GreaterThan(hi, p2) if p2.semanticEquals(p) && fromBound(hi) => hi
      }
      upper.map(hi => RangePair(p, lo, hi))
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  private def hasEquiConjunct(cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  private def rewrite(
      j: Join, pointSide: LogicalPlan, boundSide: LogicalPlan,
      pair: RangePair, cond: Expression, w: Long): LogicalPlan = {
    // point side: one synthesized bin column
    val binL = Alias(bin(pair.point, w), "graft_bin_p")()
    val pointProj = Project(pointSide.output :+ binL, pointSide)
    // interval side: explode the covered bin range; empty for lo > hi.
    // A span wider than MaxBinsPerRow raises an ACTIONABLE error naming
    // the conf instead of Sequence's opaque array-length failure (and
    // never a silent cap — truncated bins would drop matches).
    val arrTy = ArrayType(LongType, containsNull = false)
    val spanOk = LessThanOrEqual(
      Subtract(bin(pair.hi, w), bin(pair.lo, w)), Literal(MaxBinsPerRow))
    val seqExpr = If(
      And(And(IsNotNull(pair.lo), IsNotNull(pair.hi)),
        LessThanOrEqual(pair.lo, pair.hi)),
      If(spanOk,
        // Sequence is TimeZoneAware: without an explicit zone it reports
        // unresolved and trips PLAN_VALIDATION (irrelevant for LONG bins,
        // required for resolution)
        new Sequence(bin(pair.lo, w), bin(pair.hi, w), Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone)),
        Cast(new RaiseError(Literal(
          s"graft range-bin join: an interval spans more than $MaxBinsPerRow " +
            s"bins at $ConfKey=$w — raise the bin width toward the typical " +
            "interval length")), arrTy)),
      // containsNull = false: must match Sequence's return type exactly or
      // the If stays unresolved (caught by PLAN_VALIDATION in tests)
      Literal.create(Array.empty[Long], arrTy))
    val binR = AttributeReference("graft_bin_i", LongType, nullable = true)()
    val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binR), boundSide)
    // original condition kept VERBATIM (it carries the exact strict/closed
    // bounds and any extra conjuncts) — the bin equality is purely additive
    val fullCond = And(EqualTo(binL.toAttribute, binR), cond)
    val (newL, newR) =
      if (j.left eq pointSide) (pointProj, gen) else (gen: LogicalPlan, pointProj: LogicalPlan)
    Project(j.output, Join(newL, newR, Inner, Some(fullCond), j.hint))
  }

  /** Test/debug hook: apply with an explicit width, bypassing the conf. */
  private[graft] def testApply(plan: LogicalPlan, w: Long): LogicalPlan =
    rewriteAll(plan, w)

  private def rewriteAll(plan: LogicalPlan, w: Long): LogicalPlan =
    plan transform {
      case j @ Join(l, r, Inner, Some(cond), _) if !hasEquiConjunct(cond, l, r) =>
        extractRange(cond, l, r).map(p => rewrite(j, l, r, p, cond, w))
          .orElse(extractRange(cond, r, l).map(p => rewrite(j, r, l, p, cond, w)))
          .getOrElse(j)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) => rewriteAll(plan, w)
  }
}
