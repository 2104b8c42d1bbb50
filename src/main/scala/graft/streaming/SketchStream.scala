package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.KmvSketch

/** Streaming per-window APPROXIMATE DISTINCT via the KMV sketch — the
  * unbounded form of w14's "daily active users" (and the streaming
  * sibling of q30's mergeable-distinct maintenance): per window the
  * state is the k smallest distinct 60-bit hashes ever seen — k longs,
  * regardless of traffic — folded incrementally by the SAME
  * [[KmvSketch]] reduce the batch aggregator uses, and the estimate
  * emits exactly once when the watermark closes the window.
  *
  * Native streaming could count distincts only by keeping every id in
  * state (dropDuplicates + count); the sketch holds the per-window
  * state at k·8 bytes and still replays bit-for-bit in an external
  * oracle (the t19/w14 portability argument, now through REAL
  * streaming execution). Closed windows leave the store.
  */
object SketchStream {

  case class Ev(win_us: Long, h: Long, ts: java.sql.Timestamp)
  case class DistinctOut(win_us: Long, n_sketch: Long, est_distinct: Double)

  def kmvDistinct(events: Dataset[Ev], windowSec: Long, k: Int,
                  watermarkDelay: String = "30 minutes")
      : Dataset[DistinctOut] = {
    require(k >= 2 && windowSec > 0)
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val agg = KmvSketch.aggregator(k)

    def fold(winUs: Long, it: Iterator[Ev],
             gs: GroupState[Array[Long]]): Iterator[DistinctOut] = {
      if (gs.hasTimedOut) {
        val mins = gs.get
        gs.remove()
        // t19/w14's exact read-off: fewer than k hashes = the sketch IS
        // the distinct set; else (k−1)·2^60 / h_k, rounded like SQL
        val est =
          if (mins.length < k) mins.length.toDouble
          else BigDecimal((k - 1).toDouble * 1152921504606846976.0 /
              mins(k - 1).toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator.single(DistinctOut(winUs, mins.length.toLong, est))
      } else {
        var buf = gs.getOption.getOrElse(Array.emptyLongArray)
        it.foreach(e => buf = agg.reduce(buf, e.h))
        gs.update(buf)
        gs.setTimeoutTimestamp(math.max((winUs / 1000L) + windowSec * 1000L,
          gs.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.win_us)
      .flatMapGroupsWithState[Array[Long], DistinctOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
