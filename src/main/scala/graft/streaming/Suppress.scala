package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** ALERT SUPPRESSION with EXPIRING STATE — the third face of Spark 4's
  * `transformWithState` (w38 exercises data-driven ValueState, w39
  * event-time timers; this is wall-clock-bounded state): the FIRST
  * event per key emits, repeats are swallowed while the key's
  * suppression window is open, and the window lapses after a
  * processing-time TTL — after a quiet TTL the next event alerts
  * again. This is the notification-dedup every paging/alerting
  * pipeline runs ("page once per incident per hour, not once per
  * error line").
  *
  * Why the expiry lives IN the state (one first-seen timestamp per
  * key, checked on read) rather than Spark's native `TTLConfig` or a
  * processing-time timer: both of those keep an `AvailableNow` drain
  * alive — the engine schedules "no new data but cleaning up state"
  * micro-batches until the TTL/timer horizon, so a drained run with a
  * 1-hour window would spin for an hour before terminating (measured:
  * the probe query never finished). An expiry TIMESTAMP is pure
  * storage: no pending work, the drain terminates after its data, and
  * an expired entry is simply overwritten by the next arrival — with
  * the one trade that a key that never fires again retains its 16
  * bytes until overwritten (the production knob for that residue is
  * exactly `TTLConfig`, on a continuous — not drained — query).
  *
  * Determinism contract: expiry is wall-clock, so results are
  * reproducible exactly when no window can lapse inside a run — the
  * drained catalog query uses a TTL far above its runtime
  * (first-per-key ≡ the batch row_number()=1 oracle), and SuppressSpec
  * pins the actual lapse-and-realert behavior with a short TTL across
  * separated micro-batches.
  */
object Suppress {

  case class Ev(user_id: Long, event_type: String, event_id: Long,
                ts: Timestamp)
  case class Alert(user_id: Long, event_type: String, event_id: Long,
                   ts: Timestamp)

  private class Processor(ttlMillis: Long)
      extends StatefulProcessor[(Long, String), Ev, Alert] {
    // wall clock the suppression window was opened at
    @transient private var openedAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      openedAt = getHandle.getValueState[Long]("opened_at",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Alert] = {
      val now = System.currentTimeMillis()
      if (openedAt.exists() && now - openedAt.get() < ttlMillis) {
        // window still open: swallow the whole batch's repeats —
        // arrivals do NOT extend the window (anchored at first-seen)
        Iterator.empty
      } else {
        openedAt.update(now)
        // emit the earliest row of the batch by event time (ties by
        // event_id) — the deterministic "first" under any arrival order
        val first = rows.minBy(e => (e.ts.getTime, e.event_id))
        Iterator.single(Alert(first.user_id, first.event_type,
          first.event_id, first.ts))
      }
    }
  }

  /** First-alert-per-(user, event_type) with repeats suppressed while
    * the key's suppression window (`ttl` of wall clock, anchored at
    * first-seen) is open. */
  def firstPerKey(events: DataFrame, ttl: java.time.Duration)
      : Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select($"user_id", $"event_type", $"event_id", $"ts").as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new Processor(ttl.toMillis),
        TimeMode.None(), OutputMode.Append())
  }
}
