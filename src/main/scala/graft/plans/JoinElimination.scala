package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** PK–FK JOIN ELIMINATION — the classic constraint-driven rewrite every
  * warehouse optimizer has and Spark lacks (it has no declared
  * constraints to trust): an INNER join `fact ⋈ dim ON fact.fk =
  * dim.pk` whose parents use ONLY fact-side columns is replaced by the
  * fact scan, because under the registered referential-integrity
  * contract the join can neither drop nor duplicate a fact row —
  * `pk` unique in dim, every `fk` NON-NULL and present in dim. Views
  * and BI layers join generically "just in case"; on a 100 TB fact the
  * dim scan + exchange this removes is pure waste whenever the query
  * doesn't actually read dim columns.
  *
  * Trust model: exactly a database's ENFORCED constraint — the
  * registration is the contract, the optimizer does not re-verify it
  * per query (q23_ri_audit is the audit-side complement that CHECKS RI
  * on demand). Matching is conservative, mirroring [[MvRewrite]]:
  *  - inner join, single-equality condition between plain attributes;
  *  - the dim side must peel (attribute-only projects) to the BARE
  *    registered scan — any dim-side Filter changes multiplicity and
  *    refuses the rewrite;
  *  - the fact side may carry filters/projections (they survive);
  *  - elimination happens only under a Project or Aggregate parent
  *    (nodes that DEFINE their output), and only when every reference
  *    is fact-side.
  * JoinEliminationSpec proves the join and the dim scan vanish from
  * the plan, that each refusal shape keeps them, and the q37 oracle
  * proves the rewritten answer equals the genuine join.
  */
object JoinElimination extends Rule[LogicalPlan] {

  /** @param factPathSuffix matched against the fact scan's root path
    * @param dimPathSuffix  matched against the dim scan's root path
    * @param factKey        FK column name on the fact side (non-null,
    *                       always present in dim — the caller's contract)
    * @param dimKey         unique PK column name on the dim side
    */
  case class RiDef(factPathSuffix: String, dimPathSuffix: String,
                   factKey: String, dimKey: String)

  // session-scoped, like MvRewrite (the rule object is process-wide)
  private val registry = new java.util.concurrent.atomic.AtomicReference[
    Map[String, Seq[RiDef]]](Map.empty)

  private def keyOf(spark: org.apache.spark.sql.SparkSession): String =
    org.apache.spark.sql.GraftShims.sessionKey(spark)

  def register(spark: org.apache.spark.sql.SparkSession, ri: RiDef): Unit = {
    val k = keyOf(spark)
    registry.updateAndGet(m => m.updated(k, m.getOrElse(k, Nil) :+ ri))
    ()
  }
  def clear(spark: org.apache.spark.sql.SparkSession): Unit = {
    registry.updateAndGet(_ - keyOf(spark)); ()
  }

  /** Dim side: attribute-only projects down to the bare relation,
    * collecting any peeled filter conjuncts — the caller verifies that
    * EVERY one is `IsNotNull(pk)` (the filter Catalyst's constraint
    * inference stamps under every equi-join; null PKs never match an
    * inner join, so it cannot change which fact rows survive). Any
    * other dim-side filter changes multiplicity and refuses.
    */
  private def bareScan(plan: LogicalPlan)
      : Option[(LogicalRelation, Seq[Expression])] = plan match {
    case r: LogicalRelation => Some((r, Nil))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      bareScan(child)
    case Filter(cond, child) =>
      bareScan(child).map { case (r, fs) =>
        (r, fs ++ splitConjuncts(cond))
      }
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Fact side: filters and attribute projections are fine (they ride
    * along untouched); we only need to IDENTIFY the scan. */
  private def factScan(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case r: LogicalRelation => Some(r)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      factScan(child)
    case Filter(_, child) => factScan(child)
    case _ => None
  }

  private def locationOf(rel: LogicalRelation): String = rel.relation match {
    case f: HadoopFsRelation =>
      f.location.rootPaths.headOption.map(_.toString).getOrElse("")
    case _ => ""
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ris = org.apache.spark.sql.GraftShims.activeSessionKey
      .flatMap(registry.get().get).getOrElse(Nil)
    if (ris.isEmpty) return plan
    plan.transformUp {
      case proj @ Project(projList, j: Join) =>
        tryEliminate(j, projList.flatMap(_.references), ris)
          .map(fact => Project(projList, fact)).getOrElse(proj)
      case agg @ Aggregate(groupings, aggExprs, j: Join, _) =>
        tryEliminate(j, (groupings ++ aggExprs).flatMap(_.references), ris)
          .map(fact => Aggregate(groupings, aggExprs, fact)).getOrElse(agg)
    }
  }

  private def tryEliminate(j: Join, refs: Seq[Attribute],
                           ris: Seq[RiDef]): Option[LogicalPlan] = j match {
    // LEFT OUTER fact ⟕ dim needs only HALF the contract — pk
    // uniqueness (no duplication); presence is irrelevant because the
    // outer join preserves every fact row and the unread dim columns
    // are null for non-matches. The dim must be the null-producing
    // right side. The IsNotNull(pk) peel stays harmless: null pks
    // never match, matched-or-not is invisible when no dim column is
    // read.
    case Join(l, r, LeftOuter, Some(EqualTo(x: AttributeReference,
        y: AttributeReference)), _) =>
      attemptWith(l, r, x, y, refs, ris, stripFk = false)
    case Join(l, r, Inner, Some(EqualTo(x: AttributeReference,
        y: AttributeReference)), _) =>
      // try both side assignments and both condition orientations. The
      // INNER path strips IsNotNull(fk) conjuncts from the fact side:
      // the contract declares fk non-null, so the filter (inferred by
      // Catalyst from the join it annotated) is a no-op — and leaving
      // it would block downstream single-scan rewrites (the MV
      // matcher) from recognizing the bare fact scan. The LEFT OUTER
      // path never strips: only the pk-uniqueness half of the contract
      // is load-bearing there, and any fk filter is user semantics.
      attemptWith(l, r, x, y, refs, ris, stripFk = true)
        .orElse(attemptWith(r, l, x, y, refs, ris, stripFk = true))
    case _ => None
  }

  private def attemptWith(fact: LogicalPlan, dim: LogicalPlan,
                          x: AttributeReference, y: AttributeReference,
                          refs: Seq[Attribute],
                          ris: Seq[RiDef],
                          stripFk: Boolean): Option[LogicalPlan] =
    for {
      (dimRel, dimFilters) <- bareScan(dim)
      factRel <- factScan(fact)
      fk <- Seq(x, y).find(fact.outputSet.contains)
      pk <- Seq(x, y).find(a => a != fk && dim.outputSet.contains(a))
      // every peeled dim filter must be the harmless inferred
      // IsNotNull(pk) — anything else changes multiplicity
      if dimFilters.forall {
        case IsNotNull(a: AttributeReference) => a.semanticEquals(pk)
        case _ => false
      }
      _ <- ris.find(ri =>
        locationOf(factRel).endsWith(ri.factPathSuffix) &&
          locationOf(dimRel).endsWith(ri.dimPathSuffix) &&
          fk.name == ri.factKey && pk.name == ri.dimKey)
      if refs.forall(fact.outputSet.contains)
    } yield if (stripFk) stripFkNotNull(fact, fk) else fact

  /** Remove IsNotNull(fk) conjuncts (no-ops under the declared
    * contract) so the eliminated fact side is the bare scan shape. */
  private def stripFkNotNull(plan: LogicalPlan, fk: Attribute): LogicalPlan =
    plan.transformUp {
      case Filter(cond, child) =>
        val kept = splitConjuncts(cond).filterNot {
          case IsNotNull(a: AttributeReference) => a.semanticEquals(fk)
          case _ => false
        }
        if (kept.isEmpty) child else Filter(kept.reduce(And), child)
    }
}
