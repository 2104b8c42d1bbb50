package graft.sources.v2

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Snapshots

/** Offset = the last fully-processed manifest VERSION. A micro-batch
  * covers the half-open version interval (start, end]. The manifest
  * log is the offset log: monotone, atomic (CREATE_NEW publish), and
  * already durable — the streaming layer adds no bookkeeping of its
  * own beyond Spark's checkpoint.
  */
case class VersionOffset(version: Int) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

/** Micro-batch stream over a snapshot table's commit feed — the
  * engine's tables become Structured Streaming SOURCES (the Delta
  * streaming-source semantics, reference analog: the CDC feed the
  * streaming pipeline exposes per batch, generalized to ANY snapshot
  * table after the fact):
  *
  *  - each batch plans exactly the files a commit ADDED (manifest diff
  *    v vs v−1) — appended data streams with zero old bytes read;
  *  - a commit that REMOVED entries (copy-on-write erase, compaction)
  *    fails loudly by default: rewritten files replay as full files,
  *    which would silently double rows. `ignoreChanges=true` opts into
  *    the at-least-once replay (the reader dedups downstream), exactly
  *    the Delta contract;
  *  - `startingVersion` picks where history starts (default 1: replay
  *    the full table then follow); `maxVersionsPerTrigger` bounds a
  *    batch; checkpoint restart resumes from the committed offset —
  *    Spark replays the in-flight interval, and because a version's
  *    file set is immutable the replayed batch is IDENTICAL
  *    (exactly-once downstream of an idempotent sink);
  *  - Trigger.AvailableNow pins the target version at stream start and
  *    drains up to it, then stops.
  *
  * State is O(1): two version numbers. File listing per batch is the
  * manifest diff — proportional to the commit, never the table.
  */
class SnapshotMicroBatchStream(tableDir: String, schema: StructType,
                               conf: ParquetGroups.SerializableConf,
                               options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val startingVersion = options.getInt("startingVersion", 1)
  private val maxVersionsPerTrigger =
    options.getInt("maxVersionsPerTrigger", Int.MaxValue)
  private val ignoreChanges = options.getBoolean("ignoreChanges", false)

  // Trigger.AvailableNow: the drain target captured at start
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(Snapshots.currentVersion(tableDir))

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[VersionOffset].version
    val cur = availableNowTarget.getOrElse(Snapshots.currentVersion(tableDir))
    VersionOffset(math.min(cur, from.toLong + maxVersionsPerTrigger).toInt)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    val cdf = options.getBoolean("readChangeFeed", false)
    val target = options.getLong("targetBytesPerPartition", 128L << 20)
    (s + 1 to e).flatMap { v =>
      val prev = Snapshots.manifestEntries(tableDir, v - 1).toSet
      val cur = Snapshots.manifestEntries(tableDir, v).toSet
      val removed = prev -- cur
      if (removed.nonEmpty && !ignoreChanges)
        throw new IllegalStateException(
          s"snapshot $tableDir v$v removed ${removed.size} entrie(s) — a " +
            "non-append commit (erase/compaction) cannot stream " +
            "exactly-once; set ignoreChanges=true to replay rewritten " +
            "files at-least-once")
      // a merge-on-read (deletion-vector) commit leaves the entry list
      // untouched but logically REMOVES rows — rows this stream already
      // emitted. Fail loudly like any other non-append commit unless
      // the reader opted into change-tolerant semantics.
      if (!ignoreChanges) {
        val dvPrev = Snapshots.deletionVectors(tableDir, v - 1)
        val dvCur = Snapshots.deletionVectors(tableDir, v)
        val dvGrew = dvCur.exists { case (f, ps) =>
          ps.length > dvPrev.get(f).map(_.length).getOrElse(0) }
        if (dvGrew) throw new IllegalStateException(
          s"snapshot $tableDir v$v added deletion vectors — a " +
            "merge-on-read delete cannot stream exactly-once (already-" +
            "emitted rows were logically removed); set " +
            "ignoreChanges=true to keep streaming the append feed")
      }
      val added = SnapshotsDataSource.filesOf(conf.value,
        (cur -- prev).toSeq.sorted)
      // bins stay per-version: for the change feed the version IS the
      // change attribution, and a multi-version catch-up batch keeps
      // file locality per commit either way
      if (cdf) SnapshotsDataSource.bin(added, target)
        .map(b => b.copy(changeType = "insert", commitVersion = v.toLong))
      else SnapshotsDataSource.bin(added, target)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ParquetGroups.GroupReaderFactory(conf, schema)

  override def deserializeOffset(json: String): Offset =
    VersionOffset("""\d+""".r.findFirstIn(json).map(_.toInt).getOrElse(
      throw new IllegalArgumentException(s"bad snapshot offset: $json")))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
