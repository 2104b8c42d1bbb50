package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a cartesian edit-distance join into the
  * PassJoin segment equi-join (the logical-plan form of
  * [[graft.operators.EditDistanceJoin]]; companion to
  * [[EpsilonJoinRewrite]] for the string-similarity predicate).
  *
  * Pattern:
  * {{{
  *   Filter(... AND levenshtein(sa, sb) <= k AND ...,
  *          Join(left, right, Cross|Inner, condition = None))
  * }}}
  * where `sa` only references `left`, `sb` only references `right` (or
  * swapped) and `k` is an integer literal in [1, 4] (the probe fan-out
  * is (2k+1)²·(k+1) rows per input row — 405 at k = 4; past that the
  * fan-out stops being obviously cheaper than scanning).
  *
  * Rewrite: the right side emits its k+1 even-partition segments keyed
  * by (length, slot, segment); the left side emits, for every candidate
  * partner length within ±k and slot, the substrings of the slot's
  * length inside the ±k shifted window (the PassJoin pigeonhole lemma —
  * ED ≤ k guarantees at least one exact segment match, so candidate
  * generation is LOSSLESS). The cartesian becomes an equi-join on the
  * composite key. A pair can match on SEVERAL (slot, position) combos,
  * so the rewrite tags each input row with a synthetic id and
  * aggregates candidates back to one row per (left-row, right-row)
  * BEFORE re-applying the original filter — the output multiset is
  * bit-identical to the cartesian plan's.
  *
  * Effect: O(N·M) BroadcastNestedLoopJoin with a per-pair O(len²)
  * verify becomes a partitionable hash join whose work tracks the
  * number of shared segments — the 100 TB shape for user-written
  * `crossJoin + levenshtein ≤ k` dedup queries.
  *
  * Disable with `spark.graft.editJoinRewrite.enabled=false`.
  */
object EditDistanceJoinRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.editJoinRewrite.enabled"
  val MaxK = 4

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transform {
      case f @ Filter(cond, Join(left, right, jt, None, hint))
          if crossLike(jt) && left.resolved && right.resolved &&
            notRewritten(left, right) && hint == JoinHint.NONE =>
        findEditConjunct(cond, left, right) match {
          case Some((sa, sb, k)) =>
            Project(f.output, Filter(cond, candidates(left, right, sa, sb, k)))
          case None => f
        }
      case j @ Join(left, right, jt, Some(cond), hint)
          if crossLike(jt) && left.resolved && right.resolved &&
            notRewritten(left, right) && hint == JoinHint.NONE &&
            !hasEquiConjunct(cond, left, right) =>
        findEditConjunct(cond, left, right) match {
          case Some((sa, sb, k)) =>
            Project(j.output, Filter(cond, candidates(left, right, sa, sb, k)))
          case None => j
        }
    }
  }

  private def crossLike(jt: JoinType): Boolean = jt == Cross || jt == Inner

  private def notRewritten(left: LogicalPlan, right: LogicalPlan): Boolean =
    !(left.output ++ right.output).exists(_.name.startsWith("__graft_ed"))

  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
                              right: LogicalPlan): Boolean =
    splitAnd(cond).exists {
      case EqualTo(a, b) => sidedRefs(a, b, left, right)
      case EqualNullSafe(a, b) => sidedRefs(a, b, left, right)
      case _ => false
    }

  private def sidedRefs(a: Expression, b: Expression,
                        left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }

  /** Locate a `levenshtein(sa, sb) <= k` (or `< k+1`) conjunct with
    * sides split across the join; returns (leftStr, rightStr, k).
    */
  private def findEditConjunct(cond: Expression, left: LogicalPlan,
                               right: LogicalPlan): Option[(Expression, Expression, Int)] = {
    def sided(x: Expression, y: Expression, k: Int): Option[(Expression, Expression, Int)] = {
      if (k < 1 || k > MaxK) return None
      if (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
        Some((x, y, k))
      else if (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet))
        Some((y, x, k))
      else None
    }
    splitAnd(cond).collectFirst(Function.unlift {
      case LessThanOrEqual(Levenshtein(x, y, None), Literal(k: java.lang.Integer, IntegerType)) =>
        sided(x, y, k.intValue)
      case LessThan(Levenshtein(x, y, None), Literal(k: java.lang.Integer, IntegerType)) =>
        sided(x, y, k.intValue - 1)
      case GreaterThanOrEqual(Literal(k: java.lang.Integer, IntegerType), Levenshtein(x, y, None)) =>
        sided(x, y, k.intValue)
      case _ => None
    })
  }

  // ---- even-partition scheme (mirrors operators/EditDistanceJoin) ----

  private def intLit(i: Int) = Literal(i, IntegerType)

  private def baseOf(lenC: Expression, kp1: Int): Expression =
    Cast(Floor(Divide(Cast(lenC, DoubleType), Literal(kp1.toDouble))), IntegerType)

  private def segLen(lenC: Expression, j: Expression, kp1: Int): Expression =
    Add(baseOf(lenC, kp1),
      If(GreaterThanOrEqual(j, Subtract(intLit(kp1), Pmod(lenC, intLit(kp1)))),
        intLit(1), intLit(0)))

  private def segStart(lenC: Expression, j: Expression, kp1: Int): Expression =
    Add(Multiply(j, baseOf(lenC, kp1)),
      Greatest(Seq(intLit(0),
        Subtract(j, Subtract(intLit(kp1), Pmod(lenC, intLit(kp1)))))))

  private def explodeInts(child: LogicalPlan, values: Seq[Expression],
                          name: String): (LogicalPlan, Attribute) = {
    val attr = AttributeReference(name, IntegerType, nullable = true)()
    (Generate(Explode(CreateArray(values)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(attr), child), attr)
  }

  /** The PassJoin candidate join over (left, right) with exact
    * per-(row, row) multiplicity; the caller re-applies the original
    * predicate on top.
    *
    * Short strings (length ≤ k): the even partition then has EMPTY
    * segments, and the pigeonhole witness can be exactly an empty one —
    * filtering zero-length segments out (the pre-r11 behavior) silently
    * lost every pair whose only witness was empty, e.g. every pair
    * involving an empty string (ADVICE r10 #1). Fix: empty segments are
    * legitimate keys. The build side emits them as `(len, slot, "")`
    * rows and the probe side emits the matching zero-length window
    * substrings, so the whole operator stays ONE equi-join (no residual
    * nested-loop branch, no cartesian in the plan). Cost is confined to
    * the short set: a zero-length segment key exists only for build
    * strings of length ≤ k, and is only probed by strings of length
    * ≤ 2k (candidate lengths are ±k).
    */
  private def candidates(left: LogicalPlan, right: LogicalPlan,
                         sa: Expression, sb: Expression, k: Int): LogicalPlan = {
    val kp1 = k + 1

    // synthetic per-row ids so multi-segment matches collapse back to
    // one candidate row per (left row, right row)
    val lid = Alias(MonotonicallyIncreasingID(), "__graft_ed_lid")()
    val rid = Alias(MonotonicallyIncreasingID(), "__graft_ed_rid")()
    val l0 = Project(left.output :+ lid, left)
    val r0 = Project(right.output :+ rid, right)

    // ---- build side: k+1 segments of sb keyed by (len, slot, segment).
    // Zero-length segments (strings of length ≤ k) stay in as
    // empty-string keys — dropping them loses empty-witness pairs
    val (r1, jb) = explodeInts(r0, (0 to k).map(intLit), "__graft_ed_jb")
    val lb = Length(sb)
    val bLen = segLen(lb, jb, kp1)
    val bStart = segStart(lb, jb, kp1)
    val buildKey = Alias(
      ConcatWs(Seq(Literal("|"), Cast(lb, StringType), Cast(jb, StringType),
        Substring(sb, Add(bStart, intLit(1)), bLen))),
      "__graft_ed_r")()
    val r2 = Project(r0.output :+ jb :+ buildKey, r1)

    // ---- probe side: candidate partner lengths ±k (length 0 — the
    // empty partner — included), each slot's shifted substring window
    val (l1, ls) = explodeInts(l0,
      (-k to k).map(d => Add(Length(sa), intLit(d))), "__graft_ed_ls")
    val l1f = Filter(GreaterThanOrEqual(ls, intLit(0)), l1)
    val (l2, jp) = explodeInts(l1f, (0 to k).map(intLit), "__graft_ed_jp")
    val pLenA = Alias(segLen(ls, jp, kp1), "__graft_ed_plen")()
    val pStartA = Alias(segStart(ls, jp, kp1), "__graft_ed_pstart")()
    val l3 = Project(l2.output :+ pLenA :+ pStartA, l2)
    val pLen = pLenA.toAttribute
    val pStart = pStartA.toAttribute
    val plo = Greatest(Seq(intLit(0), Subtract(pStart, intLit(k))))
    val phi = Least(Seq(Subtract(Length(sa), pLen), Add(pStart, intLit(k))))
    // pLen = 0 rows survive (empty probe substrings match empty build
    // segments); only a descending window is impossible
    val l4 = Filter(LessThanOrEqual(plo, phi), l3)
    val pAttr = AttributeReference("__graft_ed_p", IntegerType, nullable = true)()
    // Sequence is TimeZoneAwareExpression: resolved only with a zone id,
    // and the analyzer's ResolveTimeZone never re-runs post-optimizer
    val l5 = Generate(Explode(new Sequence(plo, phi, Some(intLit(1)),
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(pAttr), l4)
    val probeKey = Alias(
      ConcatWs(Seq(Literal("|"), Cast(ls, StringType), Cast(jp, StringType),
        Substring(sa, Add(pAttr, intLit(1)), pLen))),
      "__graft_ed_l")()
    val l6 = Project(l0.output :+ probeKey, l5)

    val joined = Join(l6, r2, Inner,
      Some(EqualTo(probeKey.toAttribute, buildKey.toAttribute)), JoinHint.NONE)

    // collapse duplicate candidates: group on the synthetic id pair,
    // First() of every original column (all rows in a group carry the
    // identical pair, so First is exact); aliases PRESERVE the original
    // exprIds so the re-applied filter and the outer projection resolve
    val lidA = lid.toAttribute
    val ridA = rid.toAttribute
    val keep = (left.output ++ right.output).map { a =>
      Alias(First(a, ignoreNulls = false).toAggregateExpression(), a.name)(
        exprId = a.exprId)
    }
    Aggregate(Seq(lidA, ridA), Seq(lidA, ridA) ++ keep, joined)
  }
}
