package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the custom-state form of
  * `operators.Sessionize` for unbounded streams, built on
  * `flatMapGroupsWithState` + event-time timeouts.
  *
  * Semantics match the batch operator exactly: a session closes when
  * the SAME key's next event is more than `gapSec` behind it (closed
  * in-batch the moment the closing event arrives), or when the
  * watermark passes last_ts + gap (the open session times out — the
  * case batch never sees because its input ends). Session indices are
  * 1-based per key, in (ts, event_id) order, carried across batches in
  * the group state.
  *
  * Scale: state per key is ONE open session + a counter (bytes, not
  * events — the fold happens as events arrive); the stream shuffles
  * once on the key, the same layout as the batch window pass. The
  * value total folds in BigDecimal so it is exact and agrees with the
  * batch decimal(18,6) sum on any arrival split.
  */
object SessionStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                value: Double)
  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                        first_event: Long, last_event: Long,
                        total_value: Double)
  /** One open session; `total` carries decimal(18,6)-cast values. */
  case class Open(idx: Long, lastUs: Long, n: Long, firstId: Long,
                  lastId: Long, total: BigDecimal)
  case class St(nextIdx: Long, open: Option[Open])

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private def toOut(key: Long, o: Open): SessionOut =
    SessionOut(key, o.idx, o.n, o.firstId, o.lastId,
      o.total.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)

  def sessions(events: Dataset[Ev], gapSec: Long,
               watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L

    def fold(key: Long, it: Iterator[Ev], state: GroupState[St])
        : Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // watermark passed last_ts + gap: the open session is final
        val st = state.get
        val closed = st.open.map(o => toOut(key, o)).toIterator
        state.update(St(st.open.map(_.idx + 1).getOrElse(st.nextIdx), None))
        closed
      } else {
        val evs = it.toIndexedSeq.sortBy(e => (micros(e.ts), e.event_id))
        var st = state.getOption.getOrElse(St(1L, None))
        val out = Seq.newBuilder[SessionOut]
        evs.foreach { e =>
          val us = micros(e.ts)
          val dec = BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          st.open match {
            case Some(o) if us - o.lastUs > gapUs =>
              out += toOut(key, o)
              st = St(o.idx + 2,
                Some(Open(o.idx + 1, us, 1L, e.event_id, e.event_id, dec)))
            case Some(o) =>
              st = st.copy(open = Some(o.copy(lastUs = us, n = o.n + 1,
                lastId = math.max(o.lastId, e.event_id),
                firstId = math.min(o.firstId, e.event_id),
                total = o.total + dec)))
            case None =>
              st = St(st.nextIdx + 1,
                Some(Open(st.nextIdx, us, 1L, e.event_id, e.event_id, dec)))
          }
        }
        state.update(st)
        st.open.foreach { o =>
          // close the open session when the watermark passes its gap
          // horizon (guard: the timeout must sit above the current
          // watermark, which can already exceed lastUs + gap when this
          // batch also carried much newer keys)
          val t = math.max(o.lastUs / 1000L + gapSec * 1000L,
            state.getCurrentWatermarkMs() + 1L)
          state.setTimeoutTimestamp(t)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
