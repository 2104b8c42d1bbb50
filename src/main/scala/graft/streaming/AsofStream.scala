package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward AS-OF join (event-time temporal join) — the
  * unbounded form of `operators.TemporalJoins.asofBackward`, and the
  * missing member of the streaming join family next to
  * IntervalStreamJoin's inner/outer/semi: each LEFT event is enriched
  * with the payload of the latest RIGHT event of the same key at or
  * before it (Flink's "temporal table join", the FX-rate / dimension-
  * version lookup shape).
  *
  * Correctness discipline: a left row at time t may only be finalized
  * once the WATERMARK passes t — until then a right row ≤ t can still
  * arrive and change the answer. Both sides are therefore BUFFERED in
  * state and folded in strict (ts, kind, id) order (right before left
  * at equal timestamps — the inclusive-≤ match; among equal-ts right
  * rows the greatest id wins) as the watermark releases them, exactly
  * the batch operator's union+running-last order. Any arrival
  * interleaving inside the horizon yields identical output.
  *
  * Scale: state per key = ONE retained right row (the running "last")
  * plus the horizon-bounded sort buffer — the same bound a temporal
  * table keeps anywhere; keys with no retained row and an empty buffer
  * are evicted. One shuffle on the key, the batch plan's layout. The
  * retained row itself has no natural expiry (a left event years later
  * still matches it) — production deployments bolt a TTL on top as a
  * RETENTION decision, not a correctness one.
  */
object AsofStream {

  /** kind: 0 = right (payload source), 1 = left (probe). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                kind: Int, value: Double)
  /** `left_us` is the left event's epoch micros (exact long). */
  case class AsofOut(user_id: Long, left_id: Long, left_us: Long,
                     right_id: Option[Long], right_value: Option[Double])

  case class Pend(us: Long, id: Long, kind: Int, value: Double)
  /** Retained latest right row; rUs < 0 means "none yet". */
  case class St(buf: Seq[Pend], rUs: Long, rId: Long, rVal: Double)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  def asof(events: Dataset[Ev],
           watermarkDelay: String = "30 minutes"): Dataset[AsofOut] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    def fold(key: Long, it: Iterator[Ev], gs: GroupState[St])
        : Iterator[AsofOut] = {
      var st = gs.getOption.getOrElse(St(Nil, -1L, 0L, 0.0))
      val wUs = gs.getCurrentWatermarkMs() * 1000L
      val all = st.buf ++
        it.map(e => Pend(micros(e.ts), e.event_id, e.kind, e.value))
      val (ready, rest) = all.partition(_.us <= wUs)
      val out = Seq.newBuilder[AsofOut]
      ready.sortBy(p => (p.us, p.kind, p.id)).foreach { p =>
        if (p.kind == 0) st = st.copy(rUs = p.us, rId = p.id, rVal = p.value)
        else out += AsofOut(key, p.id, p.us,
          if (st.rUs >= 0) Some(st.rId) else None,
          if (st.rUs >= 0) Some(st.rVal) else None)
      }
      st = st.copy(buf = rest)
      if (st.rUs < 0 && rest.isEmpty) {
        gs.remove()
      } else {
        gs.update(st)
        if (rest.nonEmpty)
          gs.setTimeoutTimestamp(math.max(rest.map(_.us).min / 1000L,
            gs.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
