package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW REWRITE — Calcite-style rollup matching as a
  * Catalyst rule: an `Aggregate` over the raw FACT scan is rewritten to
  * a RE-AGGREGATION over a registered rollup MV whenever the MV can
  * answer it — query grouping ⊆ MV grouping, and every aggregate is
  * derivable from the MV's partial states (count → sum of per-group
  * counts, sum → sum of pre-sums, min/max → self-merge, avg → Σpre-sums
  * / Σnon-null counts; the q27 merge algebra, applied by the OPTIMIZER
  * instead of by hand). The query text never changes; the 100 TB fact
  * scan simply stops happening.
  *
  * Matching is deliberately conservative — plain-column groupings; a
  * filter below the aggregate only if it touches MV grouping columns
  * exclusively (then it applies identically to the rollup);
  * COMPLETE-mode count(1)/sum aggregates only (optionally under a
  * cast) — and every output column must translate, or the plan is
  * left untouched. The
  * rewritten aggregate preserves the original output `exprId`s (parents
  * keep resolving) and casts re-aggregated sums back to the original
  * result type (re-summing a pre-sum widens decimals by construction).
  *
  * Correctness is gated twice: q33's oracle proves the rollup algebra
  * equals the from-scratch aggregate, and MvRewriteSpec proves the
  * rewrite actually SERVES the query (a deliberately perturbed MV shows
  * up in the answer) and that the fact scan disappears from the plan.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** @param factPathSuffix matched against the fact scan's root path
    * @param mvPlan         ANALYZED plan of the MV table read
    * @param groupCols      the MV's grouping columns (superset test)
    * @param countCol       MV column holding per-group row counts
    * @param sumCols        fact column name → MV pre-sum column name
    * @param minCols        fact column name → MV pre-min column name
    * @param maxCols        fact column name → MV pre-max column name
    * @param cntCols        fact column name → MV per-column NON-NULL
    *                       count column (`count(x)`, not `count(1)`) —
    *                       the second partial state `avg(x)` needs:
    *                       avg = Σpre-sums / Σnon-null-counts, which is
    *                       exactly Spark's own Average merge algebra
    */
  case class MvDef(factPathSuffix: String, mvPlan: LogicalPlan,
                   groupCols: Set[String], countCol: String,
                   sumCols: Map[String, String],
                   minCols: Map[String, String] = Map.empty,
                   maxCols: Map[String, String] = Map.empty,
                   cntCols: Map[String, String] = Map.empty)

  // Registrations are scoped PER SESSION (ADVICE r11): the rule object
  // is a process-wide singleton injected into every SparkSession, so a
  // global registry would silently rewrite matching fact aggregates
  // planned by UNRELATED sessions between register() and clear().
  // Keyed by sessionUUID; apply() resolves the planning thread's active
  // session and sees only that session's MVs.
  private val registry = new java.util.concurrent.atomic.AtomicReference[
    Map[String, Seq[MvDef]]](Map.empty)

  private def keyOf(spark: org.apache.spark.sql.SparkSession): String =
    org.apache.spark.sql.GraftShims.sessionKey(spark)

  def register(spark: org.apache.spark.sql.SparkSession, mv: MvDef): Unit = {
    val k = keyOf(spark)
    registry.updateAndGet(m => m.updated(k, m.getOrElse(k, Nil) :+ mv))
    ()
  }
  def clear(spark: org.apache.spark.sql.SparkSession): Unit = {
    registry.updateAndGet(_ - keyOf(spark)); ()
  }

  /** Peel attribute-only Projects and at most ONE Filter (in any
    * order — the optimizer interleaves them) off the scan. */
  private def decompose(plan: LogicalPlan)
      : Option[(Option[Expression], LogicalRelation)] = plan match {
    case r: LogicalRelation => Some((None, r))
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      decompose(child)
    case Filter(cond, child) => decompose(child).flatMap {
      case (None, r) => Some((Some(cond), r))
      case _ => None
    }
    case _ => None
  }

  private def locationOf(rel: LogicalRelation): String = rel.relation match {
    case f: HadoopFsRelation =>
      f.location.rootPaths.headOption.map(_.toString).getOrElse("")
    case _ => ""
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = org.apache.spark.sql.GraftShims.activeSessionKey
      .flatMap(registry.get().get).getOrElse(Nil)
    if (mvs.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        // a filter BETWEEN the aggregate and the scan is translatable
        // when it touches only MV grouping columns — it then applies
        // identically to the rollup (every fact row of a group shares
        // the group's values, so filtering groups ≡ filtering rows)
        (for {
          (filterCond, rel) <- decompose(child)
          mv <- mvs.find(m => locationOf(rel).endsWith(m.factPathSuffix))
          rewritten <- tryRewrite(groupings, aggExprs, filterCond, mv)
        } yield rewritten).getOrElse(agg)
    }
  }

  private def tryRewrite(groupings: Seq[Expression],
                         aggExprs: Seq[NamedExpression],
                         filterCond: Option[Expression],
                         mv: MvDef): Option[LogicalPlan] = {
    val mvOut = mv.mvPlan.output.map(a => a.name -> a).toMap

    // every column the filter touches must be an MV grouping column;
    // remap its attributes onto the MV's output
    val newFilter = filterCond.map { cond =>
      val ok = cond.references.forall(a =>
        mv.groupCols.contains(a.name) && mvOut.contains(a.name))
      if (!ok) return None
      cond.transform {
        case a: AttributeReference => mvOut(a.name)
      }
    }

    val newGroup = groupings.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) &&
          mvOut.contains(a.name) => mvOut(a.name)
      case _ => return None
    }

    def reSum(src: AttributeReference): Option[Expression] =
      mv.sumCols.get(src.name).flatMap(mvOut.get).map(c =>
        AggregateExpression(Sum(c), Complete, isDistinct = false))

    val newAggs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) &&
          mvOut.contains(a.name) =>
        Alias(mvOut(a.name), a.name)(exprId = a.exprId)
      case al: Alias =>
        // an output column may carry one presentation cast OUTSIDE the
        // aggregate (`sum(x).cast("double")`) — unwrap, translate the
        // aggregate, re-apply the cast
        val (inner, rewrap): (Expression, Expression => Expression) =
          al.child match {
            case c: Cast => (c.child, e => Cast(e, c.dataType))
            case e => (e, identity[Expression] _)
          }
        val translated: Expression = inner match {
          case AggregateExpression(cnt: Count, Complete, false, None, _)
              if cnt.children == Seq(Literal(1)) && mvOut.contains(mv.countCol) =>
            // count(1) over the fact = sum of the MV's per-group
            // counts; coalesce keeps count's non-null contract
            Coalesce(Seq(
              Cast(AggregateExpression(Sum(mvOut(mv.countCol)), Complete,
                isDistinct = false), inner.dataType),
              Literal.create(0L, inner.dataType)))
          // count(x) — the NON-NULL count of a column — re-aggregates
          // from the same per-column count state avg uses
          case AggregateExpression(cnt: Count, Complete, false, None, _)
              if cnt.children.size == 1 =>
            val src = cnt.children.head match {
              case a: AttributeReference => a
              case c: Cast => c.child match {
                case a: AttributeReference => a
                case _ => return None
              }
              case _ => return None
            }
            mv.cntCols.get(src.name).flatMap(mvOut.get) match {
              case Some(c) =>
                Coalesce(Seq(
                  Cast(AggregateExpression(Sum(c), Complete,
                    isDistinct = false), inner.dataType),
                  Literal.create(0L, inner.dataType)))
              case None => return None
            }
          case AggregateExpression(s: Sum, Complete, false, None, _) =>
            val src = s.child match {
              case a: AttributeReference => a
              case c: Cast => c.child match {
                case a: AttributeReference => a
                case _ => return None
              }
              case _ => return None
            }
            // re-summing the pre-sum widens the type; cast back to the
            // original result type (the value is the same total)
            reSum(src) match {
              case Some(e) => Cast(e, inner.dataType)
              case None => return None
            }
          // avg(x) re-aggregates BOTH of Average's partial states from
          // the MV: Σ(pre-sums) / Σ(per-column non-null counts). The
          // denominator must be count(x), never count(1) — a null x
          // contributes to neither state, so using the row count would
          // deflate the average. The division is guarded (0 → NULL, the
          // all-null-group answer) so the rewrite stays ANSI-safe.
          case AggregateExpression(av: Average, Complete, false, None, _) =>
            val src = av.child match {
              case a: AttributeReference => a
              case c: Cast => c.child match {
                case a: AttributeReference => a
                case _ => return None
              }
              case _ => return None
            }
            // double-result averages only: decimal avg carries its own
            // precision/scale rules a re-derived division may not match
            if (inner.dataType != org.apache.spark.sql.types.DoubleType)
              return None
            val num = reSum(src).getOrElse(return None)
            val cnt = mv.cntCols.get(src.name).flatMap(mvOut.get)
              .getOrElse(return None)
            val den = AggregateExpression(Sum(cnt), Complete,
              isDistinct = false)
            Divide(
              Cast(num, org.apache.spark.sql.types.DoubleType),
              If(EqualTo(den, Literal(0L)),
                Literal.create(null, org.apache.spark.sql.types.DoubleType),
                Cast(den, org.apache.spark.sql.types.DoubleType)))
          // min/max are SELF-mergeable: min of per-group mins IS the min
          case AggregateExpression(m: Min, Complete, false, None, _) =>
            m.child match {
              case a: AttributeReference
                  if mv.minCols.get(a.name).exists(mvOut.contains) =>
                AggregateExpression(Min(mvOut(mv.minCols(a.name))),
                  Complete, isDistinct = false)
              case _ => return None
            }
          case AggregateExpression(m: Max, Complete, false, None, _) =>
            m.child match {
              case a: AttributeReference
                  if mv.maxCols.get(a.name).exists(mvOut.contains) =>
                AggregateExpression(Max(mvOut(mv.maxCols(a.name))),
                  Complete, isDistinct = false)
              case _ => return None
            }
          // a NON-aggregate result expression over grouping columns only
          // (CollapseProject folds `SELECT 'tag' AS arm, key AS k, ...`
          // projections into the aggregate's result list): every fact
          // row of a group shares the grouping values, so the expression
          // evaluates identically over the rollup — remap its
          // attributes. Deterministic only: a nondeterministic
          // expression is not "the same value per group" in any sense a
          // rewrite may reason about.
          case e if e.deterministic &&
              !e.exists(_.isInstanceOf[AggregateExpression]) &&
              e.references.forall(a =>
                mv.groupCols.contains(a.name) && mvOut.contains(a.name)) =>
            e.transform { case a: AttributeReference => mvOut(a.name) }
          case _ => return None
        }
        Alias(rewrap(translated), al.name)(exprId = al.exprId)
      case _ => return None
    }
    val base = newFilter.map(Filter(_, mv.mvPlan)).getOrElse(mv.mvPlan)
    Some(Aggregate(newGroup, newAggs, base))
  }
}
