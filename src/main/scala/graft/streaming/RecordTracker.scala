package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** PER-KEY RECORD DETECTION on Spark 4's `transformWithState` — the
  * arbitrary-state API that replaced `flatMapGroupsWithState`: emit a
  * row whenever a key posts a NEW PERSONAL BEST (value strictly above
  * every prior value for that key), carrying the beaten previous best —
  * the leaderboard/alerting change-detector every telemetry pipeline
  * runs ("notify when a user/sensor/model metric sets a record").
  *
  * State is ONE double per key (`ValueState[Double]` — the smallest
  * possible stateful footprint; compare the session/funnel operators'
  * row buffers), read and updated once per (key, micro-batch). Within a
  * batch the key's rows sort by (ts, event_id) so emission order is the
  * event-time order regardless of arrival interleaving; across batches
  * the state store carries the running best, so a time-ordered replay
  * (the snapshot source's per-commit batches) produces exactly the
  * batch-query answer — w38's oracle replays the semantics as a
  * running-max window.
  *
  * At 100 TB: state is 8 bytes/key and the operator is embarrassingly
  * key-parallel; TTL (`TTLConfig`) is the knob a production deployment
  * would set to let dormant keys expire — left NONE here so the drained
  * run is exactly the batch semantics.
  */
object RecordTracker {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class Record(user_id: Long, event_id: Long, value: Double,
                    prev_best: Option[Double])

  private class Processor extends StatefulProcessor[Long, Ev, Record] {
    @transient private var best: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[Double]("best",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Record] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur: Option[Double] = if (best.exists()) Some(best.get()) else None
      val out = Seq.newBuilder[Record]
      sorted.foreach { e =>
        if (cur.forall(e.value > _)) {
          out += Record(e.user_id, e.event_id, e.value, cur)
          cur = Some(e.value)
        }
      }
      cur.foreach(best.update)
      out.result().iterator
    }
  }

  /** New-record events of a (possibly streaming) frame with columns
    * (user_id, event_id, ts, value). Append-mode, no event-time timers
    * (pure data-driven state). */
  def records(events: DataFrame): Dataset[Record] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select($"user_id", $"event_id", $"ts", $"value").as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }

  case class Inactive(user_id: Long, last_seen: Timestamp)

  /** INACTIVITY DETECTION — the TIMER half of transformWithState: each
    * arriving event re-arms the key's single event-time timer at
    * `last_seen + gap`; when the WATERMARK passes an armed timer (the
    * key stayed quiet for a full gap of event time), the expired-timer
    * callback emits one (key, last_seen) alert and clears the state.
    * This is the churn/outage detector ("tell me when a device goes
    * dark") that polling a table cannot express incrementally — the
    * watermark, not a scheduler, decides quiet-ness, so replays and
    * restarts produce the same alerts. State: one timestamp + one
    * timer per key.
    */
  private class TimeoutProcessor(gapMillis: Long)
      extends StatefulProcessor[Long, Ev, Inactive] {
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("last_seen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Inactive] = {
      val newest = rows.map(_.ts.getTime).max
      val last = math.max(newest,
        if (lastSeen.exists()) lastSeen.get() else Long.MinValue)
      lastSeen.update(last)
      // ONE armed timer per key: disarm whatever an earlier batch set
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last + gapMillis)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Inactive] = {
      val out =
        if (lastSeen.exists())
          Iterator.single(Inactive(key, new Timestamp(lastSeen.get())))
        else Iterator.empty
      lastSeen.clear()
      out
    }
  }

  /** Inactivity alerts over a watermarked streaming frame with columns
    * (user_id, event_id, ts, value): one (user, last_seen) row per key
    * whose event time goes quiet for `gap`, decided by the watermark. */
  def inactivity(events: DataFrame, gap: String,
                 watermarkDelay: String): Dataset[Inactive] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMillis =
      org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String
          .fromString(gap)) match {
        case iv =>
          require(iv.months == 0, "calendar-month gaps are not event-time")
          iv.days * 86400000L + iv.microseconds / 1000L
      }
    events.select($"user_id", $"event_id", $"ts", $"value")
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new TimeoutProcessor(gapMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
