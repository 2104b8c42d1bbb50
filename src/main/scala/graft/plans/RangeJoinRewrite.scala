package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a point-in-interval range join into a
  * slot-bucketed equi-join (the logical-plan twin of
  * [[graft.operators.TemporalJoins.intervalJoin]]).
  *
  * Pattern — a join whose only usable predicate is a range sandwich:
  * {{{
  *   Filter(... AND s ≤ p AND p < e AND ...,  Join(left, right, Inner|Cross, None))
  * }}}
  * (any mix of strict/non-strict bounds; either comparison operand
  * order) where `p` references one join side only and `s`, `e` the
  * other side only. Catalyst has no join selection for this shape — it
  * plans a BroadcastNestedLoopJoin, O(N·M) compares with one side fully
  * broadcast, the classic range-join trap.
  *
  * Rewrite: time (or the integral domain) is cut into fixed-width
  * slots; the interval side explodes into one row per covered slot
  * (`sequence(slot(s), slot(e))`), the point side computes its single
  * slot, and the join becomes an equi-join on the slot id. The ORIGINAL
  * filter is re-applied on top, so the rewrite is exact for ANY slot
  * width and ANY interval length: slotting is monotonic, hence
  * s ≤ p ≤ e ⟹ slot(s) ≤ slot(p) ≤ slot(e) — every qualifying pair
  * shares a slot row, and each (interval, point) pair meets on exactly
  * one slot (the point's), so no dedup is needed. Null bounds produce
  * null slots, which an inner equi-join drops — same rows the original
  * null-rejecting predicate dropped.
  *
  * Slot width is the one perf knob (candidates = slot co-occupancy):
  * `spark.graft.rangeJoinRewrite.slotWidthSec` (timestamps, default
  * 3600) / `spark.graft.rangeJoinRewrite.slotWidth` (integral domains,
  * default 3600). Disable with
  * `spark.graft.rangeJoinRewrite.enabled=false`. Note the row-explosion
  * bound: an interval spanning k slots emits k rows, so a pathological
  * interval (centuries at the hourly default) hits Spark's sequence
  * length limit with a clear error — raise the slot width for such
  * domains, or disable the rule for that query.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangeJoinRewrite.enabled"
  val WidthSecKey = "spark.graft.rangeJoinRewrite.slotWidthSec"
  val WidthKey = "spark.graft.rangeJoinRewrite.slotWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transform {
      // shape 1: filter above a condition-less cross join
      case f @ Filter(cond, Join(left, right, jt, None, hint))
          if crossLike(jt) && left.resolved && right.resolved &&
            notRewritten(cond) && noExplicitHint(hint) =>
        findRangeSandwich(cond, left, right) match {
          case Some(rs) => Project(f.output, Filter(cond, slotJoin(left, right, rs)))
          case None => f
        }
      // shape 2: pushdown already folded the predicate into the join
      // condition. Only fires when no equi conjunct exists — with one,
      // Catalyst already has a hash join and slotting would be a
      // downgrade.
      case j @ Join(left, right, jt, Some(cond), hint)
          if crossLike(jt) && left.resolved && right.resolved &&
            notRewritten(cond) && noExplicitHint(hint) &&
            !hasEquiConjunct(cond, left, right) =>
        findRangeSandwich(cond, left, right) match {
          case Some(rs) => Project(j.output, Filter(cond, slotJoin(left, right, rs)))
          case None => j
        }
    }
  }

  private def crossLike(jt: JoinType): Boolean = jt == Cross || jt == Inner

  private def notRewritten(cond: Expression): Boolean =
    !cond.references.exists(_.name.startsWith("__graft_slot"))

  private def noExplicitHint(hint: JoinHint): Boolean = hint == JoinHint.NONE

  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
                              right: LogicalPlan): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a, b) => sidedPair(a, b, left, right)
      case EqualNullSafe(a, b) => sidedPair(a, b, left, right)
      case _ => false
    }

  private def sidedPair(a: Expression, b: Expression, left: LogicalPlan,
                        right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** point expression + interval bounds + which join side the point is on */
  private case class RangeSandwich(point: Expression, lo: Expression,
                                   hi: Expression, pointOnLeft: Boolean)

  /** Slot-able domains: timestamps (µs) and integral types. */
  private def slotable(dt: DataType): Boolean = dt match {
    case TimestampType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Find conjuncts `lo ≤/< p` and `p ≤/< hi` over the same `p`, with
    * `p` bound to one join side and BOTH bounds to the other.
    */
  private def findRangeSandwich(cond: Expression, left: LogicalPlan,
                                right: LogicalPlan): Option[RangeSandwich] = {
    // normalize every comparison conjunct to (smaller, larger)
    val ordered: Seq[(Expression, Expression)] = splitConjuncts(cond).collect {
      case LessThan(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b) => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
    }
    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
      else None

    val candidates = for {
      (lo, p1) <- ordered
      (p2, hi) <- ordered
      if p1.semanticEquals(p2) && slotable(p1.dataType) &&
        lo.dataType == p1.dataType && hi.dataType == p1.dataType
      pSide <- sideOf(p1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != pSide
    } yield RangeSandwich(p1, lo, hi, pointOnLeft = pSide)
    candidates.headOption
  }

  private def slotOf(x: Expression): Expression = x.dataType match {
    case TimestampType =>
      val widthUs = conf.getConfString(WidthSecKey, "3600").toLong * 1000000L
      IntegralDivide(UnixMicros(x), Literal(widthUs))
    case _ =>
      val width = conf.getConfString(WidthKey, "3600").toLong
      IntegralDivide(Cast(x, LongType), Literal(width))
  }

  /** The slot equi-join — candidate generation only; the caller
    * re-applies the full original predicate on top. Integer division
    * truncates toward zero rather than flooring, which is fine: it is
    * still monotonic, and monotonicity is all the coverage argument
    * needs. A malformed interval (hi < lo) yields a descending
    * sequence — harmless extra candidates the residual filter drops.
    */
  private def slotJoin(left: LogicalPlan, right: LogicalPlan,
                       rs: RangeSandwich): LogicalPlan = {
    val (pointPlan, intervalPlan) =
      if (rs.pointOnLeft) (left, right) else (right, left)

    val pointKey = Alias(slotOf(rs.point), "__graft_slot_p")()
    val p2 = Project(pointPlan.output :+ pointKey, pointPlan)

    val slotAttr = AttributeReference("__graft_slot_i", LongType, nullable = true)()
    // Sequence is TimeZoneAwareExpression: without a timeZoneId it
    // reports unresolved and fails plan validation (the zone is inert
    // here — the sequence runs over long slot ids)
    val slots = new Sequence(slotOf(rs.lo), slotOf(rs.hi), None,
      Some(conf.sessionLocalTimeZone))
    val i2 = Generate(
      Explode(slots),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(slotAttr), intervalPlan)

    Join(p2, i2, Inner,
      Some(EqualTo(pointKey.toAttribute, slotAttr)), JoinHint.NONE)
  }
}
