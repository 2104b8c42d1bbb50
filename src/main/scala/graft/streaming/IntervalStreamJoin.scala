package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval-containment join with watermarks — the
  * streaming form of `TemporalJoins.intervalJoin` (J8), same slot
  * bucketing (cf. Flink's interval join; reference surface: the
  * incident-window correlation shape of aws-samples
  * news-clustering-and-summarization's trigger/feed correlation).
  *
  * Interval rows explode into the ≤ ⌈len/width⌉+1 slot ids they overlap;
  * point rows key by their slot. The stream-stream join is then an EQUI
  * join on the slot id — Spark's symmetric-hash stream join partitions
  * state by that key, the property that matters at scale (no broadcast,
  * no per-row full-state scan) — with the exact range residual inside the
  * join condition. Watermarks on both event-time columns plus the
  * explicit `point.ts ∈ [interval.start, interval.start + maxLen]` bound
  * let the state store expire rows as the watermark advances: state is
  * bounded by (watermark horizon + interval length) · arrival rate, not
  * stream length.
  *
  * Inner-join semantics: matches emit as soon as both sides arrive
  * (append mode); nothing waits for the watermark except state cleanup.
  */
object IntervalStreamJoin {

  /** @param intervals streaming side with `startCol`/`endCol` (end exclusive)
    * @param points    streaming side with `tsCol`
    * @param slotWidthSec slot width; ≥ the max interval length keeps the
    *                     explode at ≤ 2 rows per interval
    * @param maxLenSec upper bound on interval length (end − start); used
    *                  as the watermark-analyzable range constraint
    * @param delay     watermark delay on both sides (event-time lateness bound)
    */
  /** @param joinType `"inner"` (default), `"left_outer"`, or
    *                  `"full_outer"`. Full-outer adds the point-side
    *                  nulls too: a point that matched NO interval emits
    *                  one null-padded row once the interval-side
    *                  watermark passes its timestamp (no interval with
    *                  `start ≤ ts` can still arrive) — the
    *                  activity-without-incident shape. A point has
    *                  exactly ONE slot, so its null row means "no match
    *                  anywhere", with none of the per-slot multiplicity
    *                  the interval side's null rows carry.
    *
    *                  `"left_outer"`: left-outer
    *                  additionally emits a null-padded row for each
    *                  (interval, slot) pair that matched NO point in
    *                  that slot, once the watermark passes the point at
    *                  which a match could still arrive — the
    *                  incident-without-activity shape. Because outer
    *                  rows are per (interval, slot), an interval that
    *                  matched in one slot but spanned an empty second
    *                  slot still emits one null row for the empty slot;
    *                  callers that want "unmatched intervals only" must
    *                  anti-join the null rows against the matched ids.
    *                  slotWidthSec ≥ interval length keeps the explode
    *                  at ≤ 2 rows per interval, and the exclusive end
    *                  never materializes a trailing slot it cannot
    *                  match (so a slot-aligned interval gets exactly
    *                  its own slot, no guaranteed-null extra row).
    */
  def join(intervals: DataFrame, points: DataFrame,
           startCol: String, endCol: String, tsCol: String,
           slotWidthSec: Long, maxLenSec: Long, delay: String,
           joinType: String = "inner"): DataFrame = {
    val widthUs = slotWidthSec * 1000000L
    def slotOf(t: Column) = floor(unix_micros(t) / widthUs)
    // endCol is EXCLUSIVE: the last slot an interval can match is the
    // one containing (end − 1 µs). Using slotOf(end) directly would,
    // for any interval whose end lands exactly on a slot boundary (the
    // len == slotWidth case this operator is sized for), explode an
    // extra trailing slot that no point can ever satisfy — harmless for
    // inner joins but a guaranteed false null-padded row under
    // left_outer once the watermark passes.
    val iv = intervals.withWatermark(startCol, delay)
      .withColumn("__slot",
        explode(sequence(slotOf(col(startCol)),
          slotOf(col(endCol) - expr("INTERVAL 1 MICROSECOND")))))
    val pt = points.withWatermark(tsCol, delay)
      .withColumn("__pslot", slotOf(col(tsCol)))
    // all non-slot column names are disjoint by construction (caller
    // selects/renames before the join), so plain col() refs are unambiguous
    iv.join(pt,
        col("__pslot") === col("__slot") &&
          col(tsCol) >= col(startCol) &&
          col(tsCol) < col(endCol) &&
          // same bound as `< endCol` when len ≤ maxLen, but phrased on the
          // two WATERMARKED columns so the join planner derives a state
          // eviction threshold for each side
          col(tsCol) <= col(startCol) + expr(s"INTERVAL $maxLenSec SECONDS"),
        joinType)
      .drop("__slot", "__pslot")
  }
}
