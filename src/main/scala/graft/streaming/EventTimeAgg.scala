package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the generic ST4 semantic the news
  * pipeline itself deliberately does not use (SURVEY §2.5: the reference
  * clusters in processing-time arrival order, and we match it), offered
  * as a first-class operator for event telemetry.
  *
  * One definition serves both execution modes:
  *   - batch: `hourly(events)` — the w8_hourly_window catalog entry,
  *     oracle-checked against DuckDB's date_trunc roll-up;
  *   - streaming: `hourlyStream(events, delay)` — the same aggregation
  *     under a watermark; rows arriving more than `delay` behind
  *     max(event time) are dropped, and in append mode each window is
  *     emitted exactly once, when the watermark passes its end.
  *
  * Scale: the aggregation state is one row per (window, event_type) —
  * bounded by the watermark horizon, not the stream length; the shuffle
  * keys on (window, event_type) so partial aggregation combines
  * map-side. Window sums follow the portable-aggregation convention
  * (decimal, order-independent).
  */
object EventTimeAgg {

  /** Hourly (window.start-labelled) roll-up per event type. */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("__total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"),
        col("n"),
        round(col("__total"), 4).cast("double").as("total_value"))

  /** Streaming form: apply the watermark BEFORE the aggregation so the
    * state store can finalize windows and drop late rows.
    */
  def hourlyStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    hourly(events.withWatermark("ts", delay))

  /** Session-window roll-up per user — the w12_session_window catalog
    * entry (oracle-checked against the portable lag/gap-sum derivation
    * in DuckDB). Merge convention, pinned by WindowFramesSpec against
    * the live operator: an event at EXACTLY prev + gap merges (brk at
    * diff > gap — the same convention w6 uses); session end = last
    * event + gap. Epoch-µs bounds keep timestamp rendering portable.
    */
  def sessions(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 2)
          .cast("double").as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start"),
        unix_micros(col("sw.end")).as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming sessions: the SAME definition under a watermark. State is
    * one open session row per (user, session) within the watermark
    * horizon — sessions merge IN STATE when a later micro-batch lands
    * inside the gap, and in append mode each session emits exactly once,
    * when the watermark passes its end (last event + gap). This is the
    * engine-fused alternative to SessionStream's hand-rolled
    * flatMapGroupsWithState form (which exists for custom per-session
    * logic; this one is the declarative default — Catalyst plans the
    * merge, partial aggregation and state eviction).
    */
  def sessionsStream(events: DataFrame, gap: String = "6 hours",
                     delay: String = "2 hours"): DataFrame =
    sessions(events.withWatermark("ts", delay), gap)
}
