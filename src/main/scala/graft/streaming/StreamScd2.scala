package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 — incremental maintenance of the
  * `operators.Scd2` history table over an unbounded change log, built
  * on `flatMapGroupsWithState`.
  *
  * Semantics: a version CLOSES (and is emitted, exactly once) the
  * moment an event with a different tracked state arrives for the same
  * key; an event repeating the current state opens no version. The
  * still-open version lives only in the group state and is never
  * emitted — so the output is exactly the batch operator's
  * `valid_to IS NOT NULL` rows, which is what `w23_stream_scd2`'s
  * oracle pins (streaming incremental ≡ batch recompute).
  *
  * Scale: state per key is ONE open version (a string + timestamp +
  * id — bytes, regardless of history length); the stream shuffles once
  * on the key, the same layout as the batch build's single exchange.
  * Events are sorted by (ts, event_id) WITHIN each batch before the
  * fold; across batches the fold assumes each key's events arrive in
  * event-time order (true for a drained file source, and for any
  * source after an EventTimeAgg-style watermark re-sequencing buffer —
  * which is where a production deployment would put one).
  */
object StreamScd2 {

  case class Ev(user_id: Long, event_type: String, ts: java.sql.Timestamp,
                event_id: Long)
  case class Closed(user_id: Long, event_type: String,
                    valid_from: java.sql.Timestamp,
                    valid_to: java.sql.Timestamp)
  /** The one open version per key. */
  case class Cur(state: String, from: java.sql.Timestamp, tie: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  def closedIntervals(events: Dataset[Ev]): Dataset[Closed] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    def fold(key: Long, it: Iterator[Ev],
             gs: GroupState[Cur]): Iterator[Closed] = {
      val sorted = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[Closed]
      var cur = gs.getOption
      for (e <- sorted) cur match {
        case None =>
          cur = Some(Cur(e.event_type, e.ts, e.event_id))
        case Some(c) if c.state != e.event_type =>
          out += Closed(key, c.state, c.from, e.ts)
          cur = Some(Cur(e.event_type, e.ts, e.event_id))
        case _ => () // same state: no new version
      }
      cur.foreach(gs.update)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fold)
  }
}
