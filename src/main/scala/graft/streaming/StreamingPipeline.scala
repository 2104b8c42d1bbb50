package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{ClusterTable, Clustering, Preprocess}
import graft.schemas.Schemas

/** Structured Streaming wrapper around the clustering engine
  * (SURVEY ST1/ST3; reference micro-batch loop
  * `process_records.py:556-608`, checkpoint `:497-553`).
  *
  * Design: `foreachBatch` + a VERSIONED state store. Spark's native
  * checkpoint (offset log under `checkpointLocation`) guarantees each
  * micro-batch is replayed with the same data after a crash; our state
  * writes are keyed by batchId (`pool/v<N>`, `table/v<N>` derived
  * deterministically from `v<N-1>`), so a replayed batch overwrites its
  * own partial output — idempotent, end-to-end exactly-once. This is
  * the Spark-native equivalent of the reference's pickle-to-S3 +
  * SQS-redelivery at-least-once loop, with strictly stronger semantics.
  *
  * Keyed state APIs (`flatMapGroupsWithState`) cannot express this
  * operator because DBSCAN merges arbitrary subsets of prior state
  * across keys each batch (SURVEY §7.3); the state-table-in-foreachBatch
  * formulation is the idiomatic escape hatch.
  */
object StreamingPipeline {

  final case class Config(
      eps: Double = Clustering.DefaultEps,
      /** physical strategy for the ε-edge join — ExactJoin (broadcast
        * batch × streamed pool) for micro-batch-sized inputs, BandJoin /
        * LshJoin when the pool is large enough that even the streamed
        * cross pass matters (the 100 TB knob, same enum as batch use) */
      strategy: Clustering.JoinStrategy = Clustering.ExactJoin,
      /** opt-in singleton TTL in pool sequence numbers (see
        * [[Clustering.Config.singletonTtl]]) — the 100 TB state-growth
        * control; None = reference parity (state grows unboundedly) */
      singletonTtl: Option[Long] = None,
      threshold: Int = 5,
      embedDim: Int = graft.functions.HashEmbed.DefaultDim,
      clock: String = "1970-01-01T00:00:00",
      /** state versions older than (latest - retain) are deleted —
        * the reference keeps one pickle; we keep a few for debugging */
      retainVersions: Int = 3,
      /** when true, each batch appends its upsert rows to `<state>/cdc/
        * v<batchId>` — the S14 change feed a downstream trigger consumes
        * (reference DynamoDB Stream NEW_IMAGE, main.tf:85-93) */
      emitCdc: Boolean = false,
      /** when false, the batch publishes its table version WITHOUT the
        * summarize pass: summarization is then driven exclusively by a
        * downstream [[CdcConsumer]] of the change feed (pair with
        * `emitCdc = true`) — the reference's decoupled trigger seam,
        * where the summarizer reacts to the stream instead of running
        * inside the clustering batch */
      inlineSummarize: Boolean = true,
      /** optional serving-table sink: per-batch partition-pruned bucket
        * rebuild into a [[graft.operators.ClusterStore]] (the DynamoDB
        * analog). Touched buckets are rewritten wholesale from the
        * versioned table, so replays are idempotent and a crash mid-write
        * is repaired by the replay (self-healing). */
      servingStore: Option[graft.operators.ClusterStore] = None,
      /** Shuffle partitions for the per-batch dataflow (None = session
        * value). A micro-batch is bounded, so host-sized exchanges are
        * pure scheduling overhead and every state write fans into that
        * many files — the batch analog of the catalog drains'
        * streamStateSession sizing (optimization r15, guide §2.2; the
        * interleaved wrapper probe measured 32 host-sized partitions at
        * zero benefit over 8). At real volumes a deployment raises it —
        * this is the knob, made explicit. */
      batchShufflePartitions: Option[Int] = None,
      /** AQE for the per-batch dataflow. Default OFF, measured
        * (optimization r15, the NewsPipeline r4 lesson reproduced on
        * the wrapper: every join in the batch dataflow carries an
        * explicit broadcast hint on its batch-bounded side, so static
        * planning is already optimal and AQE's per-exchange stage
        * materialization is pure scheduling overhead — the interleaved
        * probe measured 925 → 217 jobs and ~60 → ~35 s per drain with
        * identical results). Turn on for deployments with skewed,
        * stats-less batch inputs. */
      batchAdaptive: Boolean = false)

  def emptyPool(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.pool)

  private def versionPath(base: String, v: Long) = s"$base/v$v"

  /** The [[CdcConsumer]]'s summarized OVERLAY of a table version: same
    * content as `v<N>` plus the summarize pass. Each consumer pass
    * publishes a FRESH pass dir — `v<N>s` (pass 0), `v<N>s1`, `v<N>s2`,
    * … — committed by its `_SUCCESS`; readers resolve the newest
    * committed pass. Nothing is renamed or overwritten under a reader
    * (ADVICE r6 — the old delete-then-rename swap could FileNotFound a
    * reader that had planned against the live overlay): prior passes
    * survive the consumer's `gracePasses` window (default 1 — see
    * [[CdcConsumer]] for the bound's honest statement), and the base
    * version is never deleted, so no crash or race window can make
    * state disappear.
    */
  private[streaming] def overlayPath(base: String, v: Long) = s"$base/v${v}s"

  private[streaming] def overlayPassPath(base: String, v: Long, pass: Long) =
    if (pass == 0L) overlayPath(base, v) else s"${overlayPath(base, v)}$pass"

  /** Overlay pass number from a parsed dir suffix: `s` → 0, `s<P>` → P;
    * base (``""``) and legacy staging (`st`) are not overlays. */
  private[streaming] def overlayPass(suffix: String): Option[Long] =
    if (suffix == "s") Some(0L)
    else if (suffix.length > 1 && suffix != "st" && suffix.head == 's')
      suffix.tail.toLongOption.filter(_ > 0L)
    else None

  /** (version, suffix) parsed from a state dir name — `v<N>`,
    * `v<N>s`/`v<N>s<P>` (overlay passes) or `v<N>st` (legacy overlay
    * staging; never read). `toLongOption`: a stray >19-digit dir name is
    * junk to skip, not a NumberFormatException that kills listings
    * (ADVICE r6). */
  private[streaming] def parseVersionDir(name: String): Option[(Long, String)] = {
    if (!name.startsWith("v")) return None
    val digits = name.drop(1).takeWhile(_.isDigit)
    val suffix = name.drop(1 + digits.length)
    val suffixOk = suffix == "" || suffix == "st" || overlayPass(suffix).isDefined
    if (digits.isEmpty || !suffixOk) None
    else digits.toLongOption.map((_, suffix))
  }

  private def committed(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Committed overlay pass numbers for table version `v`, ascending. */
  private[streaming] def overlayPasses(spark: SparkSession, base: String,
                                       v: Long): Seq[Long] = {
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.flatMap { st =>
      parseVersionDir(st.getPath.getName) match {
        case Some((ver, sfx)) if ver == v && committed(fs, st.getPath) =>
          overlayPass(sfx)
        case _ => None
      }
    }.sorted
  }

  private[streaming] def readVersion(spark: SparkSession, base: String, v: Long,
                                     empty: => DataFrame): DataFrame = {
    if (v < 0) return empty
    val p = new Path(versionPath(base, v))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // prefer the newest committed overlay pass; older committed passes
    // (the grace window) and then the base version are the fallbacks if
    // a pass was pruned between listing and read
    overlayPasses(spark, base, v).reverse.foreach { pass =>
      val over = new Path(overlayPassPath(base, v, pass))
      if (committed(fs, over)) {
        try return spark.read.parquet(over.toString)
        catch { case scala.util.control.NonFatal(_) => }
      }
    }
    if (committed(fs, p)) spark.read.parquet(p.toString) else empty
  }

  private def prune(spark: SparkSession, base: String, latest: Long, retain: Int): Unit = {
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      parseVersionDir(st.getPath.getName).foreach { case (v, _) =>
        if (v <= latest - retain) fs.delete(st.getPath, true)
      }
    }
    // retire the pruned versions' snapshot pointers with their data
    graft.sources.Snapshots.prunePointers(spark, base, latest - retain)
  }

  /** One micro-batch: preprocess → embed → cluster → upsert → trigger →
    * summarize, reading state v(batchId-1) and writing v(batchId).
    * Public so tests can drive replay semantics directly.
    */
  def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
                   cfg: Config = Config()): Unit = {
    val spark = batch.sparkSession
    // per-batch execution discipline (see Config.batchShufflePartitions/
    // batchAdaptive): applied to the stream's own session for the span
    // of the batch and restored after — foreachBatch hands us the
    // streaming clone, but tests drive processBatch on shared sessions
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    cfg.batchShufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    spark.conf.set("spark.sql.adaptive.enabled", cfg.batchAdaptive.toString)
    try processBatchInner(batch, batchId, stateDir, cfg)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  private def processBatchInner(batch: DataFrame, batchId: Long,
                                stateDir: String, cfg: Config): Unit = {
    val spark = batch.sparkSession
    val poolBase = s"$stateDir/pool"
    val tableBase = s"$stateDir/table"
    val pool = readVersion(spark, poolBase, batchId - 1, emptyPool(spark))
    val table = readVersion(spark, tableBase, batchId - 1, ClusterTable.emptyTable(spark))

    // P10: a JSON file source parses corrupt lines to all-null rows;
    // drop records missing the required-field contract
    // (README.md:204-221 — id/text/title/date) before processing
    val valid = batch.filter(
      col("id").isNotNull && col("text").isNotNull &&
        col("title").isNotNull && col("date").isNotNull)

    val prepped = Preprocess(valid, cfg.embedDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (prepped.isEmpty) {
        // still publish the state version so restore finds a contiguous chain
        pool.write.mode("overwrite").parquet(versionPath(poolBase, batchId))
        table.write.mode("overwrite").parquet(versionPath(tableBase, batchId))
        graft.sources.Snapshots.publishPointer(spark, tableBase, batchId, 0L,
          versionPath(tableBase, batchId))
      } else {
        val step = Clustering.step(
          pool, prepped.select(col("id"), col("concat_embedding")),
          Clustering.Config(eps = cfg.eps, strategy = cfg.strategy,
            singletonTtl = cfg.singletonTtl))
        // A5 pool statistics as OBSERVED metrics (reference recalculated
        // stats every batch, `process_records.py:313-319,427-434`):
        // observe() piggybacks on the state write — zero extra jobs —
        // and surfaces via QueryExecutionListener / the SQL metrics UI.
        val observedPool = step.pool.observe("graft_pool_stats",
          sum(when(col("is_cluster"), 1).otherwise(0)).as("n_clusters"),
          sum(when(!col("is_cluster"), 1).otherwise(0)).as("n_singletons"),
          sum(col("n_articles")).as("total_articles"))
        val ups = ClusterTable.upsertRows(table, step.assignments, prepped, cfg.clock)
        val merged = ClusterTable.merge(table, ups)
        val updated = step.assignments.select(col("cluster_id").as("PK")).distinct()
        val next =
          if (cfg.inlineSummarize) ClusterTable.summarizePass(merged, updated, cfg.threshold)
          else merged
        observedPool.write.mode("overwrite").parquet(versionPath(poolBase, batchId))
        next.write.mode("overwrite").parquet(versionPath(tableBase, batchId))
        // snapshot publish (VERDICT r11 #4): the batch's table version
        // enters the pointer log — readers (latestTable) resolve the
        // manifest instead of listing/ranking the data tree. Idempotent
        // under batch replay (same deterministic dir), rank 0 = base;
        // the CdcConsumer's summarized overlays publish higher ranks.
        graft.sources.Snapshots.publishPointer(spark, tableBase, batchId, 0L,
          versionPath(tableBase, batchId))
        if (cfg.emitCdc)
          ups.write.mode("overwrite").parquet(versionPath(s"$stateDir/cdc", batchId))
        // Serving store: REBUILD the touched buckets wholesale from the
        // versioned table (the source of truth) rather than merging the
        // batch's upserts against the store's current content. A merge
        // would not survive a crash mid-write: dynamic partition
        // overwrite truncates whole buckets, and replaying only the
        // batch's own upserts cannot reinstate OTHER clusters that
        // shared a truncated bucket (ADVICE r2). Replaying a bucket
        // rebuild is idempotent AND self-healing — it always rewrites
        // the complete bucket contents from committed state.
        cfg.servingStore.foreach { store =>
          val truth = spark.read.parquet(versionPath(tableBase, batchId))
          store.rebuildBucketsFor(
            truth, truth.join(broadcast(updated), Seq("PK"), "left_semi"))
        }
      }
      prune(spark, poolBase, batchId, cfg.retainVersions)
      prune(spark, tableBase, batchId, cfg.retainVersions)
    } finally prepped.unpersist()
  }

  /** Latest committed clusters table (the read path / A9 input).
    *
    * Primary path: the SNAPSHOT POINTER LOG (`table/_snapshots`,
    * [[graft.sources.Snapshots.publishPointer]]) — resolve max
    * (version, rank) over the published pointers and read exactly that
    * directory, never listing/ranking the data tree (VERDICT r11 #4:
    * atomic publish + O(1) rollback on the engine's own state; the
    * ranking is IDENTICAL to the legacy listing's (version,
    * overlay-pass) order, so results are byte-equal). A pointer whose
    * directory was pruned between listing and read, or whose
    * `_SUCCESS` is missing (crash mid-write before publish can't
    * happen — publish follows the write — but a half-deleted prune
    * can), falls through to the next-ranked pointer.
    *
    * Fallback path (no pointer log — a pre-r12 state dir): list the
    * data tree; only `_SUCCESS`-committed versions are candidates, a
    * committed summarized overlay pass (`v<N>s`, `v<N>s<P>`) outranks
    * its base version, newer passes outrank older; staging dirs are
    * never read (ADVICE r2 / r6 semantics, unchanged).
    */
  def latestTable(spark: SparkSession, stateDir: String): DataFrame = {
    val base = new Path(s"$stateDir/table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return ClusterTable.emptyTable(spark)
    val pointers = graft.sources.Snapshots.pointerEntries(spark, s"$stateDir/table")
    if (pointers.nonEmpty) {
      pointers.sortBy { case (v, r, _) => (-v, -r) }.foreach {
        case (_, _, dir) =>
          val p = new Path(dir)
          if (committed(fs, p)) return spark.read.parquet(p.toString)
      }
      return ClusterTable.emptyTable(spark)
    }
    val cands = fs.listStatus(base).map(_.getPath.getName).flatMap { n =>
      parseVersionDir(n) match {
        case Some((v, suffix)) if suffix != "st" &&
          committed(fs, new Path(base, n)) =>
          // rank: base = 0, overlay pass P = P + 1
          Some((v, overlayPass(suffix).fold(0L)(_ + 1L), n))
        case _ => None
      }
    }
    if (cands.isEmpty) ClusterTable.emptyTable(spark)
    else {
      val (_, _, name) = cands.maxBy { case (v, rank, _) => (v, rank) }
      spark.read.parquet(new Path(base, name).toString)
    }
  }

  /** Start the stream: `articles` must be a streaming DataFrame with the
    * raw-article schema. Offsets commit under `checkpointDir`; state
    * versions land under `stateDir`.
    */
  def start(articles: DataFrame, stateDir: String, checkpointDir: String,
            cfg: Config = Config(),
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    articles.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir, cfg)
      }
      .start()
}
