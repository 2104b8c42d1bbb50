package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window TOP-K (the live leaderboard): counts per
  * (tumbling window, category), ranked WITHIN the window, emitted
  * exactly once when the watermark passes the window end.
  *
  * Native Structured Streaming cannot express this — ranking is a
  * window function over an aggregate, and append-mode streaming allows
  * neither a rank over a streaming aggregate nor retraction of a
  * leaderboard that changed. The custom-state form sidesteps both:
  * state is the window's count map (one long per category seen — NOT
  * per event), the rank is computed once, at close, when the answer is
  * final. Ties break (count desc, category asc), so emission is
  * deterministic and oracle-replayable.
  *
  * Scale: one shuffle on the window key; state ∝ open windows ×
  * categories (the watermark horizon bounds open windows, closed
  * windows are REMOVED from the store); emission is exactly-once by
  * construction — a late event below the watermark is dropped by the
  * engine before it could resurrect a closed window.
  */
object TopKStream {

  case class Ev(win_us: Long, category: String, ts: java.sql.Timestamp)
  case class TopOut(win_us: Long, category: String, n: Long, rk: Int)

  def topK(events: Dataset[Ev], windowSec: Long, k: Int,
           watermarkDelay: String = "30 minutes"): Dataset[TopOut] = {
    require(k >= 1 && windowSec > 0)
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    def fold(winUs: Long, it: Iterator[Ev],
             gs: GroupState[Map[String, Long]]): Iterator[TopOut] = {
      if (gs.hasTimedOut) {
        // the watermark passed the window end: the answer is final
        val counts = gs.get
        gs.remove()
        counts.toSeq.sortBy { case (c, n) => (-n, c) }.take(k)
          .zipWithIndex.map { case ((c, n), i) =>
            TopOut(winUs, c, n, i + 1)
          }.iterator
      } else {
        var counts = gs.getOption.getOrElse(Map.empty[String, Long])
        it.foreach { e =>
          counts = counts.updated(e.category, counts.getOrElse(e.category, 0L) + 1L)
        }
        gs.update(counts)
        // close when the watermark reaches the window end
        gs.setTimeoutTimestamp(math.max((winUs / 1000L) + windowSec * 1000L,
          gs.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.win_us)
      .flatMapGroupsWithState[Map[String, Long], TopOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
