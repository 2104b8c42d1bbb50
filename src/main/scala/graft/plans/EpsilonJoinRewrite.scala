package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.FloatVectorDot

/** Optimizer rule: rewrite a cartesian ε-similarity join into the exact
  * pivot-band equi-join (SURVEY §4 "custom physical design" item 3).
  *
  * Pattern:
  * {{{
  *   Filter(... AND unit_cosine_distance(va, vb) <= eps AND ...,
  *          Join(left, right, Cross|Inner, condition = None))
  * }}}
  * where `va` only references `left`, `vb` only references `right` (or
  * swapped) and `eps` is a literal in (0, 1]. The
  * `unit_cosine_distance` shape is the tree both
  * [[graft.functions.VectorFns.unitCosineDistance]] and the SQL function
  * registered by [[graft.GraftExtensions]] produce:
  * `least(greatest(1.0 - float_vector_dot(va, vb), 0.0), 1.0)`.
  *
  * Rewrite (same dataflow as
  * [[graft.operators.SimilarityJoin.bandExact]], built as resolved
  * logical nodes): the build side gets one band key per coordinate-axis
  * pivot tuple, the probe side explodes the 3^pivots neighboring
  * tuples, and the cartesian product becomes an equi-join on the band
  * key. The ORIGINAL filter (including the distance predicate) is
  * re-applied on top, so the rewrite is exact — banding only prunes
  * candidates; the 1-Lipschitz pivot-angle argument guarantees zero
  * recall loss for eps ≤ 1. Output columns and order are unchanged.
  *
  * Effect: Catalyst gets a partitionable shuffled hash join instead of
  * a O(N·M) BroadcastNestedLoopJoin — the difference between "works on
  * a demo" and "works on 100 TB" for user-written `crossJoin + filter`
  * similarity queries.
  *
  * Disable with `spark.graft.epsJoinRewrite.enabled=false`.
  */
object EpsilonJoinRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.epsJoinRewrite.enabled"
  val Pivots = 2

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transform {
      // shape 1: filter still sits above a condition-less cross join
      case f @ Filter(cond, Join(left, right, jt, None, hint))
          if crossLike(jt) && left.resolved && right.resolved &&
            notRewritten(cond) && noExplicitHint(hint) =>
        findEpsConjunct(cond, left, right) match {
          case Some((va, vb, eps)) =>
            Project(f.output, Filter(cond, bandJoin(left, right, va, vb, eps)))
          case None => f
        }
      // shape 2: predicate pushdown already folded the filter into the
      // join condition (the state this rule sees when it runs after the
      // main batches via experimental.extraOptimizations). Only fires
      // when the condition carries NO usable equi-join conjunct — if it
      // does, Catalyst already plans a hash join and banding would be a
      // downgrade.
      case j @ Join(left, right, jt, Some(cond), hint)
          if crossLike(jt) && left.resolved && right.resolved &&
            notRewritten(cond) && noExplicitHint(hint) &&
            !hasEquiConjunct(cond, left, right) =>
        findEpsConjunct(cond, left, right) match {
          case Some((va, vb, eps)) =>
            Project(j.output, Filter(cond, bandJoin(left, right, va, vb, eps)))
          case None => j
        }
    }
  }

  private def crossLike(jt: JoinType): Boolean = jt == Cross || jt == Inner

  /** Re-application guard: once rewritten, the band-key equality can be
    * pushed back into the join condition by later pushdown passes — the
    * reserved attribute prefix marks the plan as ours.
    */
  private def notRewritten(cond: Expression): Boolean =
    !cond.references.exists(_.name.startsWith("__graft_band"))

  /** An explicit per-side join hint (e.g. the clusterer's deliberate
    * broadcast of the micro-batch in `SimilarityJoin.exact`) is a
    * physical choice the user already made — leave the plan alone.
    */
  private def noExplicitHint(hint: JoinHint): Boolean = hint == JoinHint.NONE

  /** True when some conjunct is an equality with one side bound to each
    * join input — the shape Catalyst extracts as a hash-join key.
    */
  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
                              right: LogicalPlan): Boolean = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    split(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case _ => false
    }
  }

  /** Locate a `unit_cosine_distance(va, vb) <= eps` conjunct with sides
    * split across the join; returns (leftVec, rightVec, eps).
    */
  private def findEpsConjunct(cond: Expression, left: LogicalPlan,
                              right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    def sided(x: Expression, y: Expression, eps: Double): Option[(Expression, Expression, Double)] = {
      if (eps <= 0 || eps > 1.0) return None
      val (xr, yr) = (x.references, y.references)
      if (xr.subsetOf(left.outputSet) && yr.subsetOf(right.outputSet)) Some((x, y, eps))
      else if (yr.subsetOf(left.outputSet) && xr.subsetOf(right.outputSet)) Some((y, x, eps))
      else None
    }
    // half-ulp widening for `round(dist, k) <= eps`: round-half-up gives
    // round(d,k) >= d - 0.5*10^-k, so any qualifying pair has
    // d <= eps + 0.5*10^-k — band with the widened bound and let the
    // original rounded predicate (re-applied on top) do the exact cut.
    // Users write exactly this shape to stabilize float output; without
    // this arm the rewrite silently degrades to a cartesian plan.
    def widened(k: java.lang.Integer, eps: Double): Double =
      if (k.intValue >= 0) eps + 0.5 * math.pow(10, -k.intValue) else eps
    split(cond).collectFirst(Function.unlift {
      case LessThanOrEqual(UnitCosineDist(x, y), Literal(v: java.lang.Double, DoubleType)) =>
        sided(x, y, v.doubleValue)
      case LessThan(UnitCosineDist(x, y), Literal(v: java.lang.Double, DoubleType)) =>
        sided(x, y, v.doubleValue)
      case LessThanOrEqual(Round(UnitCosineDist(x, y), Literal(k: java.lang.Integer, IntegerType), _),
                           Literal(v: java.lang.Double, DoubleType)) =>
        sided(x, y, widened(k, v.doubleValue))
      case LessThan(Round(UnitCosineDist(x, y), Literal(k: java.lang.Integer, IntegerType), _),
                    Literal(v: java.lang.Double, DoubleType)) =>
        sided(x, y, widened(k, v.doubleValue))
      case _ => None
    })
  }

  /** Matches the resolved `least(greatest(1.0 - dot(x,y), 0.0), 1.0)`
    * tree (in either child order for least/greatest).
    */
  private object UnitCosineDist {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Least(Seq(Greatest(Seq(Subtract(Literal(one: java.lang.Double, DoubleType),
                                           FloatVectorDot(x, y), _), Literal(zero, _))),
                     Literal(oneTop, _)))
          if one == 1.0 && zero == 0.0 && oneTop == 1.0 =>
        Some((x, y))
      case _ => None
    }
  }

  /** The band equi-join over (left, right) — candidates only; the caller
    * re-applies the full original predicate on top.
    */
  private def bandJoin(left: LogicalPlan, right: LogicalPlan,
                       va: Expression, vb: Expression, eps: Double): LogicalPlan = {
    val thetaEps = math.acos(1.0 - eps)

    // failOnError=false + coalesce-to-0: a vector shorter than the pivot
    // index contributes a ZERO component — exactly FloatVectorDot's
    // min-length (zero-padding) semantics — so its axis angle is
    // acos(0), not a null that Greatest would skip into an acos(−1)
    // clamp. Keeps the rewrite exact for ragged-dimension inputs the
    // cross-join plan accepts.
    def theta(v: Expression, k: Int): Expression =
      Acos(Least(Seq(
        Greatest(Seq(
          Coalesce(Seq(
            Cast(ElementAt(v, Literal(k + 1), None, failOnError = false), DoubleType),
            Literal(0.0))),
          Literal(-1.0))),
        Literal(1.0))))
    def bandOf(v: Expression, k: Int): Expression =
      Cast(Floor(Divide(theta(v, k), Literal(thetaEps))), IntegerType)

    // build side: single band tuple key appended to the right plan
    val buildKey = Alias(
      ConcatWs(Literal("|") +:
        (0 until Pivots).map(k => Cast(bandOf(vb, k), StringType))),
      "__graft_band_r")()
    val r2 = Project(right.output :+ buildKey, right)

    // probe side: explode the 3^pivots neighbor tuples over the left plan
    val offsets = (0 until Pivots).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(t => Seq(-1, 0, 1).map(o => t :+ o))
    }
    // array_distinct: with well-formed vectors all 3^p neighbor keys are
    // distinct (no-op); with null bands (short vectors) the keys
    // collapse to one, preserving the emit-each-pair-once guarantee
    val probeKeys = ArrayDistinct(CreateArray(offsets.map { off =>
      ConcatWs(Literal("|") +: off.zipWithIndex.map { case (o, k) =>
        Cast(Add(bandOf(va, k), Literal(o)), StringType)
      })
    }))
    val probeAttr = AttributeReference("__graft_band_l", StringType, nullable = true)()
    val l2 = Generate(Explode(probeKeys), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(probeAttr), left)

    // the caller layers Filter(original predicate) on top — banding is
    // candidate pruning only, so results are bit-identical to the
    // cartesian plan
    Join(l2, r2, Inner,
      Some(EqualTo(probeAttr, buildKey.toAttribute)), JoinHint.NONE)
  }
}
