package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic event-stream window: a new
  * session starts when the time since the SAME key's previous event
  * exceeds `gapSec`. One hash shuffle on the key; the break flags and
  * the running session counter are a single window pass (lag + running
  * sum over the same (key, ts, id) order), so per-key cost is linear in
  * that key's events and the plan scales out on the key exactly like
  * any keyed aggregation. Tie-break on the unique event id keeps the
  * order — and therefore session ids — engine-stable.
  */
object Sessionize {

  /** Input rows plus `session_idx`: 1-based session index per key, in
    * (ts, id) order.
    */
  def apply(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
            gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__brk", when(prev.isNull ||
          unix_micros(col(tsCol)) - unix_micros(prev) > gapSec * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("session_idx", sum(col("__brk")).over(w))
      .drop("__brk")
  }

  /** Per-session roll-up: (key, session_idx, n_events, first/last event
    * id, total value).
    *
    * `total_value` sums in decimal(18,6), not double: double addition is
    * not associative, so `round(sum(double), 2)` depends on the partial-
    * aggregation combine order and can land on either side of a .005
    * boundary run-to-run (the round-6 w6 flake). Decimal addition is
    * exact and order-independent; the final cast back to double keeps
    * the public schema.
    */
  def stats(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
            valueCol: String, gapSec: Long): DataFrame =
    apply(events, keyCol, tsCol, idCol, gapSec)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(idCol)).as("first_event"),
        max(col(idCol)).as("last_event"),
        round(sum(col(valueCol).cast("decimal(18,6)")), 2)
          .cast("double").as("total_value"))
}
