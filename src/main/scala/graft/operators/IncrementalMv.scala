package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over snapshot tables — the
  * missing half of the MV story: [[graft.plans.MvRewrite]] SERVES
  * queries from a materialized aggregate, this keeps that aggregate
  * CURRENT as the base table commits, at delta cost instead of
  * recompute cost (the DBSP/IVM delta-query idea specialized to
  * grouped aggregates; reference analog: the summarize writeback keeps
  * per-cluster aggregates current as batches land — the
  * news-clustering-and-summarization container pipeline stages).
  *
  * The MV is itself a snapshot table holding PARTIAL-AGGREGATE STATE
  * per group — `n` (row count), `sum_<c>`/`cnt_<c>` (self-mergeable sum
  * and its non-null count, so SUM serves NULL-correctly and AVG derives
  * as sum/cnt), `min_<c>`/`max_<c>` — the same state vocabulary
  * MvRewrite translates queries onto. Refresh is:
  *
  *  1. `delta` = [[ChangeFeed.changes]] between the MV's recorded base
  *     version and the target version — manifest-diff-sized, never
  *     O(table): appends read only appended files.
  *  2. one aggregation of the delta with a ±1 SIGN (insert/update_post
  *     → +1, delete/update_pre → −1): `n`, `sum`, `cnt` merge by signed
  *     addition — they are group homomorphisms, deletes included.
  *  3. MIN/MAX are NOT invertible under deletes: groups whose delta
  *     carries any negative row are DIRTY and their min/max recompute
  *     from the base@to restricted by a semi join to just those groups
  *     (group-clustered layouts let footer skipping bound that scan);
  *     clean groups fold the delta's insert-only min/max with
  *     `least`/`greatest`.
  *  4. groups whose count reaches zero leave the MV; the new state
  *     publishes as the MV table's next snapshot version (an MV is
  *     group-cardinality-sized — rewriting it is the cheap side), with
  *     the base version it reflects recorded next to the manifest so
  *     the next refresh knows its own lineage.
  *
  * At 100 TB the point is the asymmetry: a day's commits touch a sliver
  * of the table, so refresh cost tracks the delta (plus dirty-group
  * min/max), while the alternative — recomputing the rollup — scans
  * everything. IncrementalMvSpec pins refresh ≡ full recompute across
  * append / delete / update / group-death, and the no-op fast path.
  */
object IncrementalMv {

  /** What the MV maintains: grouped by `groupCols`; signed-mergeable
    * sum state for `sumCols` (each also gets a non-null count so NULL
    * semantics survive merging), non-null counts for `countCols`,
    * dirty-recomputed extremes for `minMaxCols`. */
  case class MvSpec(groupCols: Seq[String],
                    sumCols: Seq[String] = Nil,
                    countCols: Seq[String] = Nil,
                    minMaxCols: Seq[String] = Nil) {
    require(groupCols.nonEmpty, "an MV needs at least one group column")
    /** every column that needs a maintained non-null count */
    def cntCols: Seq[String] = (sumCols ++ countCols).distinct
  }

  /** The full-recompute form of the MV state — refresh must always
    * equal this applied to the base@to. */
  def fullState(base: DataFrame, spec: MvSpec): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        spec.sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        spec.cntCols.map(c => count(col(c)).as(s"cnt_$c")) ++
        spec.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    base.groupBy(spec.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize the MV from `baseVersion` (default: current) as the MV
    * table's next snapshot version. Returns the MV version. */
  def initialize(spark: SparkSession, baseDir: String, mvDir: String,
                 spec: MvSpec, baseVersion: Option[Int] = None): Int = {
    val bv = baseVersion.getOrElse(Snapshots.currentVersion(baseDir))
    require(bv > 0, s"base table $baseDir has no committed version")
    val mvv = replaceCommit(spark, mvDir,
      fullState(Snapshots.read(spark, baseDir, Some(bv)), spec))
    writeLineage(mvDir, mvv, bv)
    mvv
  }

  /** Fold the base's commits since the last refresh into the MV.
    * `keyCol` is the base table's primary key (the change feed's update
    * pairing contract). No-op (no new MV version) when the base hasn't
    * moved. Returns the current MV version. */
  def refresh(spark: SparkSession, baseDir: String, mvDir: String,
              keyCol: String, spec: MvSpec,
              toVersion: Option[Int] = None): Int = {
    val to = toVersion.getOrElse(Snapshots.currentVersion(baseDir))
    val from = lastBaseVersion(mvDir)
    require(to >= from,
      s"refresh target v$to precedes the MV's recorded base v$from")
    if (to == from) return Snapshots.currentVersion(mvDir)

    val g = spec.groupCols
    val delta = ChangeFeed.changes(spark, baseDir, from, to, keyCol)
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
    val dAggs: Seq[Column] =
      Seq(sum(col("__sign")).as("__dn"),
        max(when(col("__sign") < 0, 1).otherwise(0)).as("__dirty")) ++
        spec.sumCols.map(c =>
          // null contributes 0 to a sum, so the signed fold may coalesce
          sum(col("__sign") * coalesce(col(c), lit(0))).as(s"__ds_$c")) ++
        spec.cntCols.map(c =>
          sum(when(col(c).isNotNull, col("__sign")).otherwise(0L))
            .as(s"__dc_$c")) ++
        spec.minMaxCols.flatMap(c => Seq(
          min(when(col("__sign") > 0, col(c))).as(s"__dmin_$c"),
          max(when(col("__sign") > 0, col(c))).as(s"__dmax_$c")))
    val dAgg = delta.groupBy(g.map(col): _*).agg(dAggs.head, dAggs.tail: _*)

    val old = Snapshots.read(spark, mvDir)
    // using-columns full outer: the group key survives coalesced
    val merged0 = old.join(dAgg, g, "full_outer")

    // min/max under deletes: recompute ONLY the dirty groups from the
    // base@to — a semi join bounds the scan to those groups' rows
    val merged =
      if (spec.minMaxCols.isEmpty) merged0
      else {
        val dirtyG = dAgg.filter(col("__dirty") === 1).select(g.map(col): _*)
        val reAggs = spec.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"__rmin_$c"), max(col(c)).as(s"__rmax_$c")))
        val re = Snapshots.read(spark, baseDir, Some(to))
          .join(dirtyG, g, "left_semi")
          .groupBy(g.map(col): _*).agg(reAggs.head, reAggs.tail: _*)
        merged0.join(re, g, "left_outer")
      }

    val n2 = coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))
    val dirty = coalesce(col("__dirty"), lit(0)) === 1
    def zeroOf(stateCol: String): Column =
      lit(0).cast(old.schema(stateCol).dataType)
    val outCols: Seq[Column] =
      g.map(col) ++ Seq(n2.as("n")) ++
        spec.sumCols.map { c =>
          val cnt2 = coalesce(col(s"cnt_$c"), lit(0L)) +
            coalesce(col(s"__dc_$c"), lit(0L))
          when(cnt2 === 0L, lit(null).cast(old.schema(s"sum_$c").dataType))
            .otherwise(coalesce(col(s"sum_$c"), zeroOf(s"sum_$c")) +
              coalesce(col(s"__ds_$c"), zeroOf(s"sum_$c"))).as(s"sum_$c")
        } ++
        spec.cntCols.map { c =>
          (coalesce(col(s"cnt_$c"), lit(0L)) +
            coalesce(col(s"__dc_$c"), lit(0L))).as(s"cnt_$c")
        } ++
        spec.minMaxCols.flatMap { c =>
          Seq(
            when(dirty, col(s"__rmin_$c"))
              .otherwise(least(col(s"min_$c"), col(s"__dmin_$c")))
              .as(s"min_$c"),
            when(dirty, col(s"__rmax_$c"))
              .otherwise(greatest(col(s"max_$c"), col(s"__dmax_$c")))
              .as(s"max_$c"))
        }
    val next = merged.select(outCols: _*).filter(col("n") > 0)

    val mvv = replaceCommit(spark, mvDir, next)
    writeLineage(mvDir, mvv, to)
    mvv
  }

  /** CONTINUOUS maintenance: a streaming query that follows the base
    * table's commit feed (the V2 connector's version-offset stream) and
    * folds each micro-batch's commits into the MV with [[refresh]].
    * The stream supplies ordering, checkpointed restart, and the
    * trigger cadence; the delta math stays in refresh — the batch's
    * ROWS are deliberately ignored (`ignoreChanges=true` keeps
    * copy-on-write erase commits streamable; their replayed rows don't
    * matter because refresh reads the manifest diff itself). Restarting
    * after a crash is safe from either side: a replayed batch sees
    * `toVersion <= lastBaseVersion` and no-ops.
    */
  def follow(spark: SparkSession, baseDir: String, mvDir: String,
             keyCol: String, spec: MvSpec, checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val feed = spark.readStream.format("graft_snapshots")
      .option("path", baseDir)
      .option("readChangeFeed", "true")
      .option("ignoreChanges", "true")
      .load()
      .select(col(graft.sources.v2.ParquetGroups.CommitVersionCol).as("__v"))
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hi = batch.agg(max(col("__v"))).head()
        if (!hi.isNullAt(0)) {
          val to = hi.getLong(0).toInt
          if (to > lastBaseVersion(mvDir))
            refresh(spark, baseDir, mvDir, keyCol, spec, Some(to))
          ()
        }
      }
      .start()
  }

  /** The base version the MV's CURRENT version reflects. */
  def lastBaseVersion(mvDir: String): Int = {
    val v = Snapshots.currentVersion(mvDir)
    require(v > 0, s"$mvDir holds no MV (initialize first)")
    val p = Paths.get(s"${metaDir(mvDir)}/base_v$v.txt")
    require(Files.exists(p), s"MV $mvDir v$v has no recorded base version")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
  }

  /** REPLACE commit: the MV's next version references only the new
    * state (an MV rewrite is O(groups), not O(base)); prior versions
    * still time-travel. */
  private def replaceCommit(spark: SparkSession, tableDir: String,
                            df: DataFrame): Int = {
    val dataDir = Snapshots.versionDataDir(
      tableDir, Snapshots.currentVersion(tableDir) + 1)
    df.write.mode("error").parquet(dataDir)
    Snapshots.commitManifest(tableDir, Seq(dataDir))
  }

  private def metaDir(mvDir: String): String = s"$mvDir/_mvmeta"

  private def writeLineage(mvDir: String, mvVersion: Int,
                           baseVersion: Int): Unit = {
    Files.createDirectories(Paths.get(metaDir(mvDir)))
    Files.write(Paths.get(s"${metaDir(mvDir)}/base_v$mvVersion.txt"),
      baseVersion.toString.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    ()
  }
}
