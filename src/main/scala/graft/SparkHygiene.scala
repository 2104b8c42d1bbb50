package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for checkpoint-per-batch loops.
  *
  * `localCheckpoint(eager = true)` parks the materialized rows in the
  * block manager; Spark frees them only when the ContextCleaner notices
  * the RDD got garbage-collected — which under driver memory pressure
  * lags arbitrarily. A micro-batch loop that checkpoints state every
  * batch therefore accumulates every superseded state version until GC
  * happens to run. These helpers free superseded checkpoints
  * deterministically instead.
  */
object SparkHygiene {

  /** Release the block-manager storage behind a `localCheckpoint`'d
    * frame. No-op for frames that aren't checkpoint-backed (e.g. the
    * empty bootstrap state), so callers can free unconditionally.
    */
  def freeCheckpoint(df: Dataset[_]): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Free EVERY checkpoint block referenced anywhere in the frame's
    * lineage. Only for frames whose entire lineage the caller owns and
    * has finished consuming — a checkpoint shared with a live frame
    * would lose its storage (it recomputes from lineage... which a
    * checkpoint no longer has).
    */
  def freeCheckpointsIn(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    }

  /** Temp directory that is recursively deleted at JVM exit — for
    * streaming catalog entries that must drain a query to a filesystem
    * sink before the caller can read the result back. `deleteOnExit`
    * alone can't remove non-empty directories, so repeated catalog
    * evaluations (sweeps, plan probes) would leak checkpoint/output
    * trees under /tmp; one shutdown hook per directory reaps them.
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file._
      import java.util.Comparator
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }))
    p.toString
  }

  /** Session clone for streaming catalog entries with the STATEFUL
    * shuffle sized to the corpus instead of the host: a streaming
    * query's state-store instance count is fixed by
    * `spark.sql.shuffle.partitions` at first checkpoint, and each
    * instance pays per-micro-batch snapshot/commit I/O whether or not
    * it holds data — so running a 100k-row drain with 32 state
    * partitions buys no parallelism and pays 32 partitions × batches ×
    * stateful-operators of fixed cost (measured: w9_outer drops ~7 s
    * going 32 → 4; the catalog callers pass 8, which lands within
    * run-to-run noise of the 4-partition floor — the cost is ~linear
    * in instance count — while keeping 2× headroom over 4 for the
    * sf0.1 state volume). Scan/sink parallelism is untouched (same
    * SparkContext and cores); only the stateful exchange narrows. At
    * real volumes the caller raises `partitions` — this is the state
    * sizing knob a deployment tunes, made explicit.
    */
  def streamStateSession(s: SparkSession, partitions: Int): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    GraftExtensions.register(s2)
    s2
  }

  /** Drop every persistent RDD still registered with the context —
    * DataFrame caches AND checkpoint blocks. For harnesses (bench,
    * verify) between independent queries: each query starts cold and no
    * prior query's leftovers distort its memory budget.
    */
  def dropAllPersisted(spark: SparkSession): Unit = {
    // blocking: an async drop races the NEXT query's memory allocation
    // on the storage lock (measured: a 5× spike on the query after a
    // large cache drop) — pay the removal here, outside any measurement
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.sharedState.cacheManager.clearCache()
  }
}
