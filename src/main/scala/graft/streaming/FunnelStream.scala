package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequential funnel with per-step event-time TIMEOUT — the
  * unbounded-stream form of `w24_funnel`'s MATCH_RECOGNIZE shape, plus
  * the half batch can't express at all: ABSENCE detection ("the user
  * viewed and then did NOT click within 30 minutes") decided by the
  * WATERMARK, not by end-of-input.
  *
  * Semantics (exactly mirrored by the w25 oracle's recursive replay):
  * per user, a `view` opens attempt n; a `click` strictly after the
  * view and within `timeout` advances it; a `purchase` strictly after
  * the click and within `timeout` CONVERTS it (steps = 3, ended at the
  * purchase). If the next step does not arrive by its deadline the
  * attempt is ABANDONED (steps = 1 or 2, ended AT the deadline) — the
  * abandonment is emitted when the watermark passes the deadline,
  * which is the earliest moment it is safe to declare (any
  * not-yet-seen event that could still rescue the attempt would have
  * event time ≤ deadline ≤ watermark, i.e. be late beyond the
  * horizon). After finalization the machine is idle; the next view
  * opens attempt n+1. Events that don't fit the machine (duplicate
  * views mid-attempt, purchases with no open click, error/signup
  * noise) are ignored, as in w24.
  *
  * Out-of-order correctness: events are BUFFERED in state and folded
  * through the machine only once the watermark passes them, in strict
  * (ts, event_id) order — so any arrival interleaving within the
  * watermark horizon produces the identical output (the
  * IntervalStreamJoin discipline, here applied to a state machine).
  *
  * Scale: state per user = the open attempt (three longs) + the
  * buffered events inside the watermark horizon — state ∝ horizon ×
  * rate, never stream length; idle users with an empty buffer are
  * REMOVED from the store. One shuffle on user_id, the same layout as
  * the batch funnel's single exchange.
  */
object FunnelStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                event_type: String)
  /** `start_us`/`end_us` are epoch micros — exact longs end to end. */
  case class FunnelOut(user_id: Long, attempt: Long, outcome: String,
                       steps: Int, start_us: Long, end_us: Long)

  /** A buffered event awaiting its watermark (state-encoder visible). */
  case class Pend(us: Long, id: Long, typ: String)
  /** st: 0 idle, 1 view seen (vUs), 2 click seen (cUs). */
  case class St(buf: Seq[Pend], att: Long, st: Int, vUs: Long, cUs: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  def funnel(events: Dataset[Ev], timeoutSec: Long,
             watermarkDelay: String = "30 minutes"): Dataset[FunnelOut] = {
    require(timeoutSec > 0, s"timeoutSec must be positive, got $timeoutSec")
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val tUs = timeoutSec * 1000000L

    def fold(key: Long, it: Iterator[Ev], gs: GroupState[St])
        : Iterator[FunnelOut] = {
      var st = gs.getOption.getOrElse(St(Nil, 0L, 0, 0L, 0L))
      val wUs = gs.getCurrentWatermarkMs() * 1000L
      // only machine-relevant types enter state: noise is ignored in
      // ANY order, so dropping it pre-buffer is semantics-free and
      // keeps noise-only keys out of the store entirely
      val all = st.buf ++ it
        .filter(e => e.event_type == "view" || e.event_type == "click" ||
          e.event_type == "purchase")
        .map(e => Pend(micros(e.ts), e.event_id, e.event_type))
      val (ready, rest) = all.partition(_.us <= wUs)
      val out = Seq.newBuilder[FunnelOut]

      def deadline: Long = if (st.st == 1) st.vUs + tUs else st.cUs + tUs
      def abandonIfPast(nowUs: Long): Unit =
        if (st.st > 0 && nowUs > deadline) {
          out += FunnelOut(key, st.att, "abandoned", st.st, st.vUs, deadline)
          st = st.copy(st = 0)
        }

      ready.sortBy(p => (p.us, p.id)).foreach { p =>
        abandonIfPast(p.us)
        (st.st, p.typ) match {
          case (0, "view") =>
            st = st.copy(att = st.att + 1, st = 1, vUs = p.us)
          case (1, "click") if p.us > st.vUs =>
            st = st.copy(st = 2, cUs = p.us)
          case (2, "purchase") if p.us > st.cUs =>
            out += FunnelOut(key, st.att, "converted", 3, st.vUs, p.us)
            st = st.copy(st = 0)
          case _ => () // machine noise: ignored
        }
      }
      abandonIfPast(wUs) // the watermark itself can pass the deadline

      st = st.copy(buf = rest)
      if (st.st == 0 && rest.isEmpty) {
        gs.remove() // idle + empty buffer: evict from the store
      } else {
        gs.update(st)
        // wake when the watermark reaches whichever comes first: the
        // open attempt's deadline or the earliest buffered event
        val wakeUs = (if (st.st > 0) Seq(deadline) else Nil) ++
          (if (rest.nonEmpty) Seq(rest.map(_.us).min) else Nil)
        gs.setTimeoutTimestamp(
          math.max(wakeUs.min / 1000L, gs.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
