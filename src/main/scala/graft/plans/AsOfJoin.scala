package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** AS-OF JOIN as a first-class operator: logical node + rewrite rule +
  * planner strategy + physical sorted-merge exec ([[AsOfJoinExec]]) —
  * the (c) path of the engine's custom-operator ladder, used because
  * the semantics ("for each left row, the single latest right row at or
  * before it") are a WHOLE-OPERATOR property no composition of built-in
  * joins expresses without materializing all candidate matches first.
  *
  * The existing composition ([[graft.operators.TemporalJoins]],
  * union + running-`last` window) is exact but pays for generality:
  * every left row rides through the window machinery and the payload is
  * carried as a struct column. This operator instead plans like a
  * sort-merge join that keeps ONE remembered row per key instead of
  * buffering a match group: one hash exchange per side on the key, a
  * per-partition sort by (key, time), then a single O(|L|+|R|) merge
  * pass with O(1) state — no window buffer, no candidate explosion, no
  * range-join trap. At 100 TB the plan is exactly as skew-sensitive as
  * an equi-join on the same key and no more.
  *
  * Wiring (all through public extension points, registered by
  * [[graft.GraftExtensions]]):
  *  1. `asof_match(lk, rk, lt, rt, tie, tolMicros)` — an
  *     [[Unevaluable]] boolean marker registered as a SQL function.
  *     Users (or [[AsOf.backward]]) place it as the condition of a
  *     left-outer or inner join.
  *  2. [[AsOfJoinRewrite]] (optimizer rule) recognizes
  *     `Join(l, r, LeftOuter|Inner, asof_match(...))`, checks
  *     sidedness/type obligations, and substitutes [[AsOfJoinNode]].
  *  3. [[AsOfJoinStrategy]] plans the node as [[AsOfJoinExec]].
  *
  * If the rule ever declines (mis-sided keys, unsupported time type)
  * the marker survives to execution and fails loudly as unevaluable —
  * a deliberate fail-closed: an as-of ask silently degrading to some
  * other join would be a correctness bug, not a fallback.
  *
  * Semantics (backward as-of, the market-data / dimension-versioning
  * direction, reference analog `SparkEntry` j19):
  * for each left row with non-null (key, time), attach the right row
  * with equal key and the greatest right-time ≤ left-time; right rows
  * tie-broken by the greatest `tie` at equal times so results are
  * deterministic under retries. `tolMicros ≥ 0` additionally requires
  * `left-time − right-time ≤ tolMicros` (in the time column's internal
  * unit: microseconds for timestamps, the raw value for long/int/date).
  * Null keys/times never match (SQL join semantics). Left-outer keeps
  * unmatched left rows with null payload; inner drops them.
  */
object AsOf {

  val FnName = "asof_match"

  /** Backward as-of join of `left` to `right` (column-API front door).
    *
    * Disambiguation is the caller's job, as with any self-join: pass
    * columns resolved against each side (`l("ts")`, `r("ts")`).
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTime: Column, rightTime: Column,
               rightTie: Column,
               toleranceMicros: Long = -1L,
               keepUnmatched: Boolean = true): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      toleranceMicros, keepUnmatched, forward = false)

  /** Forward (first-at-or-after) as-of join — the
    * "next activity after the event" direction: for each left row, the
    * EARLIEST right row with equal key and right-time ≥ left-time;
    * ties at the matched time resolve to the greatest `tie`, matching
    * [[graft.operators.TemporalJoins.asofForward]]. `toleranceMicros`
    * bounds `right-time − left-time`.
    */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: Column, rightKey: Column,
              leftTime: Column, rightTime: Column,
              rightTie: Column,
              toleranceMicros: Long = -1L,
              keepUnmatched: Boolean = true): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      toleranceMicros, keepUnmatched, forward = true)

  private def join(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column,
                   rightTie: Column, toleranceMicros: Long,
                   keepUnmatched: Boolean, forward: Boolean): DataFrame =
    left.join(right,
      call_function(FnName, leftKey, rightKey, leftTime, rightTime,
        rightTie, lit(toleranceMicros), lit(forward)),
      if (keepUnmatched) "left" else "inner")
}

/** The analysis-time marker: a boolean "condition" that only exists to
  * be pattern-matched away by [[AsOfJoinRewrite]]. Unevaluable, so a
  * plan it survives into cannot silently run with wrong semantics.
  */
case class AsOfMark(children: Seq[Expression])
    extends Expression with Unevaluable {
  require(children.length == 7,
    "asof_match(leftKey, rightKey, leftTime, rightTime, rightTie, " +
      "tolMicros, forward)")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Logical as-of join. Output = left columns, then right columns
  * (nullable when `keepUnmatched` — the left-outer shape).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, toleranceMicros: Long,
    keepUnmatched: Boolean, forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (keepUnmatched) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override lazy val resolved: Boolean =
    childrenResolved && Seq(leftKey, rightKey, leftTime, rightTime, rightTie)
      .forall(_.resolved)

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: `Join(l, r, LeftOuter|Inner, Some(AsOfMark(...)))`
  * → [[AsOfJoinNode]], when every obligation holds:
  *  - key/time/tie expressions resolve against the side they claim;
  *  - key types match exactly, time types match and are one of
  *    timestamp / timestamp_ntz / long / int / date (the merge compares
  *    their internal fixed-width encoding directly);
  *  - the tolerance is a foldable long.
  */
object AsOfJoinRewrite extends Rule[LogicalPlan] {

  private val timeTypes: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(m: AsOfMark), _)
        if (jt == LeftOuter || jt == Inner) &&
          left.resolved && right.resolved =>
      val Seq(lk, rk, lt, rt, tie, tol, fwd) = m.children
      val sided =
        lk.references.subsetOf(left.outputSet) &&
        lt.references.subsetOf(left.outputSet) &&
        rk.references.subsetOf(right.outputSet) &&
        rt.references.subsetOf(right.outputSet) &&
        tie.references.subsetOf(right.outputSet)
      val typed = lk.dataType == rk.dataType &&
        lt.dataType == rt.dataType &&
        timeTypes.contains(lt.dataType) && tol.foldable &&
        tol.dataType == LongType && fwd.foldable &&
        fwd.dataType == BooleanType
      if (sided && typed) {
        val tolMicros = tol.eval().asInstanceOf[Long]
        AsOfJoinNode(left, right, lk, rk, lt, rt, tie, tolMicros,
          keepUnmatched = jt == LeftOuter,
          forward = fwd.eval().asInstanceOf[Boolean])
      } else j
  }
}
