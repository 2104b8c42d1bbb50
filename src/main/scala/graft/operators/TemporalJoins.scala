package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native physical strategy for:
  * backward as-of join and interval (range-containment) join.
  *
  * Both avoid the naive `a.crossJoin(b).filter(range predicate)` plan,
  * which Catalyst executes as BroadcastNestedLoopJoin — O(N·M) compare
  * operations and a broadcast of one entire side, the classic 100 TB
  * range-join trap. Instead:
  *
  *  - `asofBackward` is the union+running-last trick: tag both inputs,
  *    union them, and run one `last(_, ignoreNulls)` window per payload
  *    column partitioned by key ordered by time. ONE shuffle on the key,
  *    per-partition sort, zero join — cost O((N+M) log batch), skew
  *    bounded by the hottest key, exactly like the equivalent
  *    sort-merge-join would be.
  *  - `intervalJoin` buckets time into fixed-width slots: an interval
  *    joins only the slots it overlaps (⌈len/width⌉+1 ≈ 2 rows for
  *    width ≥ interval length), a point joins its slot. The range
  *    predicate becomes a shuffled hash equi-join on the slot id plus an
  *    exact residual filter — partitionable, AQE-skew-splittable, and
  *    candidate count is bounded by slot co-occupancy, not |L|·|R|.
  */
object TemporalJoins {

  /** Backward (last-value-before) as-of join.
    *
    * For each left row, attaches the payload of the latest right row with
    * the same `keyCol` and `tsCol` ≤ the left row's time (inclusive; a
    * right row at the exact same timestamp matches). Rows with no prior
    * right match keep null payloads — the caller decides whether that is
    * a left-outer keep or a filter.
    *
    * Determinism: right rows tie-broken by `rightIdCol` (latest id wins
    * at equal timestamps), so results are stable across retries and
    * engines — a requirement for the oracle hash-compare and for
    * exactly-once replay.
    *
    * @param payloadCols right-side columns to attach, emitted as
    *                    `asof_<name>`
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                   leftIdCol: String, rightIdCol: String,
                   payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, leftIdCol, rightIdCol,
      payloadCols, forward = false)

  /** Forward (first-value-after) as-of join — the mirror of
    * [[asofBackward]]: for each left row, the payload of the EARLIEST
    * right row with the same key and `tsCol` ≥ the left row's time
    * (inclusive). The "next activity after the incident" shape —
    * time-to-resolution, next-click attribution. Same plan (ONE shuffle
    * on the key, a single window pass, no range join) — only the
    * traversal direction flips; right-row ties at the matched timestamp
    * resolve to the greatest `rightIdCol`, same as backward.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                  leftIdCol: String, rightIdCol: String,
                  payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, leftIdCol, rightIdCol,
      payloadCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                       leftIdCol: String, rightIdCol: String,
                       payloadCols: Seq[String], forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val payloadType = StructType(
      payloadCols.map(c => right.schema(c)).toArray)

    // The whole right payload rides in ONE struct per row: a right row
    // whose payload FIELDS are null is still a non-null struct, so
    // `last(_, ignoreNulls)` attaches THAT row's (null) values instead
    // of skipping past it to an older row — and all asof_* columns are
    // guaranteed to come from the SAME right row (per-column last() can
    // mix rows when some fields are null).
    //
    // left rows: kind=1 (sorts AFTER right at equal ts ⇒ inclusive match)
    val lAligned = left.withColumn("__kind", lit(1))
      .withColumn("__tie", col(leftIdCol).cast("long"))
      .withColumn("__p", lit(null).cast(payloadType))

    // right rows: kind=0, payload materialized, left-only columns nulled
    val leftExtra = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val rBase = right.select(
      col(keyCol), col(tsCol), lit(0).as("__kind"),
      col(rightIdCol).cast("long").as("__tie"),
      struct(payloadCols.map(col): _*).as("__p"))
    val rAligned = leftExtra.foldLeft(rBase) { (d, c) =>
      d.withColumn(c, lit(null).cast(leftTypes(c)))
    }

    // forward = the same traversal over REVERSED time: right rows at
    // the left row's exact ts still precede it (kind asc), so the
    // inclusive match holds in both directions
    val tsOrd = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrd, col("__kind").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lAligned.unionByName(rAligned)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__kind") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Interval-containment join: pairs each `intervals` row with every
    * `points` row satisfying `start ≤ ts < end` (end-exclusive).
    *
    * Slot width should be ≥ the typical interval length — each interval
    * then lands in ≤ 2 slots. Longer intervals still join correctly
    * (`sequence` emits every overlapped slot); they just fan out more
    * index rows, which is the correct cost model — an interval spanning
    * k slots genuinely is a candidate for k slots' worth of points.
    *
    * Output: all interval columns + all point columns.
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
                   startCol: String, endCol: String, tsCol: String,
                   slotWidthSec: Long): DataFrame = {
    val widthUs = slotWidthSec * 1000000L
    def slotOf(t: org.apache.spark.sql.Column) = floor(unix_micros(t) / widthUs)
    // end-exclusive ⇒ the last candidate slot is the one containing
    // end − 1 µs: for a non-aligned end that IS slotOf(end), but for an
    // end exactly on a slot boundary slotOf(end) would be an extra slot
    // no point can satisfy — pure fan-out waste (and, in the streaming
    // left_outer sibling, a guaranteed-false null row)
    val iv = intervals.withColumn("__slot",
      explode(sequence(slotOf(col(startCol)),
        slotOf(col(endCol) - expr("INTERVAL 1 MICROSECOND")))))
    val pt = points.withColumn("__slot", slotOf(col(tsCol)))
    iv.join(pt, "__slot")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__slot")
  }
}
