package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Planner strategy for [[AsOfJoinNode]] — the single-case dispatch
  * that turns the logical as-of into the physical sorted-merge exec.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, tol, outer, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, tol, outer, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: a sort-merge join that remembers ONE
  * row instead of buffering a match group.
  *
  * Planner contract — this is where the scale behavior is declared, and
  * Catalyst (EnsureRequirements) supplies the machinery:
  *  - `requiredChildDistribution` = clustered on the key, both sides →
  *    exactly one hash exchange per side (or zero when an upstream
  *    operator already partitioned by the key — the reuse the
  *    declarative form buys).
  *  - `requiredChildOrdering` = (key, time) left / (key, time, tie)
  *    right → per-partition sorts, spill-safe, no driver involvement.
  *  - `outputPartitioning`/`outputOrdering` pass the left child's
  *    through, so a downstream groupBy/window on the same key plans
  *    zero additional exchanges.
  *
  * The merge itself is O(|L|+|R|) per partition with O(1) state: one
  * remembered candidate (the latest right row ≤ the current left time
  * for the current key) and one cursor per side. Right rows are copied
  * once when remembered — the only per-row allocation; compare that to
  * the window form, which shuffles left payloads through the state
  * machinery too. Skew sensitivity is exactly an equi-join's on the
  * same key: a hot key serializes its own partition and nothing else.
  *
  * Time comparison uses the column's fixed-width internal encoding
  * (micros for timestamps, days for dates, the raw value for ints and
  * longs), which is order-isomorphic to the SQL value — so tolerance
  * arithmetic is plain long subtraction. Key equality uses the
  * interpreted natural ordering of the key type (any atomic orderable
  * key works; keys are single expressions by the marker contract).
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, toleranceMicros: Long, keepUnmatched: Boolean,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (keepUnmatched) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  // Tie order: within equal (key, time) the MATCH must be the greatest
  // tie-break. Backward remembers the LAST consumed row → ties ascend;
  // forward matches the cursor's FIRST at-or-after row → ties descend.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, if (forward) Descending else Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val rk = rightKey
    val lt = leftTime; val rt = rightTime
    val tol = toleranceMicros
    val outer = keepUnmatched
    val fwd = forward
    val outAttrs = output
    // int-backed time encodings widen to long in the merge
    val timeIsInt = lt.dataType == IntegerType || lt.dataType == DateType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      def timeOf(row: InternalRow): Long =
        if (timeIsInt) row.getInt(0).toLong else row.getLong(0)

      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // bind the result against NULLABLE right attrs: the null-row path
      // feeds nulls into columns the child schema declares non-null, and
      // a projection bound to the child nullability would skip the null
      // check and read zeros
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ (if (outer) rOut.map(_.withNullability(true)) else rOut))

      new Iterator[InternalRow] {
        // right cursor (projections reuse their buffers; valid = usable
        // non-null key and time — invalid rows sort first and are
        // consumed eagerly, they can never match)
        private var rRow: InternalRow = _
        private var rKeyRow: UnsafeRow = _
        private var rTime: Long = 0L
        private var rValid = false
        private def loadRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKeyRow = rKeyProj(rRow)
            val t = rTimeProj(rRow)
            rValid = !rKeyRow.isNullAt(0) && !t.isNullAt(0)
            if (rValid) rTime = timeOf(t)
          } else { rRow = null; rValid = false }
        loadRight()

        // the remembered candidate: latest right row consumed for its key
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _
        private var matchedTime = 0L

        private var pending: InternalRow = _

        private def computeNext(): Unit =
          while (pending == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKeyRow = lKeyProj(lRow)
            val lTimeRow = lTimeProj(lRow)
            var ok = false
            var matchRow: InternalRow = null
            if (!lKeyRow.isNullAt(0) && !lTimeRow.isNullAt(0)) {
              val lTime = timeOf(lTimeRow)
              if (!fwd) {
                // BACKWARD: consume right rows up to (key, time];
                // remember the last same-key one — ties at equal time
                // resolve to the sort order's last, i.e. the greatest
                // tie-break
                var advancing = rRow != null
                while (advancing) {
                  val cmp = if (rValid) keyOrd.compare(rKeyRow, lKeyRow) else -1
                  if (!rValid || cmp < 0 || (cmp == 0 && rTime <= lTime)) {
                    if (rValid && cmp == 0) {
                      matched = rRow.copy()
                      matchedKey = rKeyRow.copy()
                      matchedTime = rTime
                    }
                    loadRight()
                    advancing = rRow != null
                  } else advancing = false
                }
                ok = matched != null &&
                  keyOrd.compare(matchedKey, lKeyRow) == 0 &&
                  (tol < 0L || lTime - matchedTime <= tol)
                if (ok) matchRow = matched
              } else {
                // FORWARD: consume right rows strictly before (key,
                // time); the match is the CURSOR itself (first
                // at-or-after, ties pre-sorted greatest-first), left
                // unconsumed — later left rows may share it
                var advancing = rRow != null
                while (advancing) {
                  val cmp = if (rValid) keyOrd.compare(rKeyRow, lKeyRow) else -1
                  if (!rValid || cmp < 0 || (cmp == 0 && rTime < lTime)) {
                    loadRight()
                    advancing = rRow != null
                  } else advancing = false
                }
                ok = rRow != null && rValid &&
                  keyOrd.compare(rKeyRow, lKeyRow) == 0 &&
                  (tol < 0L || rTime - lTime <= tol)
                if (ok) matchRow = rRow
              }
            }
            if (ok) {
              numMatched += 1
              pending = resultProj(joined(lRow, matchRow))
            } else if (outer) {
              pending = resultProj(joined(lRow, nullRight))
            }
            if (pending != null) numOutputRows += 1
          }

        override def hasNext: Boolean = {
          if (pending == null) computeNext()
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of merge")
          val r = pending; pending = null; r
        }
      }
    }
  }
}
