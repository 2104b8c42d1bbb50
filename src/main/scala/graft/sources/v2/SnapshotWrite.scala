package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.sources.Snapshots

/** WRITE side of the V2 snapshot connector — append-only batch writes
  * and an EXACTLY-ONCE streaming sink, both riding the manifest
  * commit's atomicity:
  *
  *  - Every task writes its own parquet file into a writer-unique
  *    staging directory and reports the file path in its commit
  *    message. The DRIVER commit publishes `previous manifest entries
  *    + exactly the committed files` — so a speculative duplicate or a
  *    retried task's leftover file is simply never referenced (and
  *    [[Snapshots.vacuum]] physically sweeps it later). No rename
  *    dance, no output committer: the manifest IS the committer.
  *  - The streaming sink makes micro-batch retries idempotent with an
  *    epoch marker (`_snapshots/epoch-<queryId>-<epochId>.cmt`,
  *    CREATE_NEW): a replayed `commit(epochId, …)` after a driver
  *    crash sees the marker and publishes nothing — the
  *    Structured-Streaming exactly-once contract from the sink side
  *    (the mirror of [[SnapshotMicroBatchStream]]'s immutable-version
  *    replay on the source side).
  *
  * Batch writes support `append` (new files join the previous entries)
  * and `overwrite` / SQL `INSERT OVERWRITE` (SupportsTruncate — the
  * commit publishes a manifest of ONLY the new files: a REPLACE
  * version, with prior versions still time-traveling and vacuum
  * reclaiming after retention). Streaming stays append-only. Rows are
  * encoded through the public parquet-hadoop record API with the same
  * type surface the read side supports.
  */
class SnapshotWriteBuilder(tableDir: String, schema0: StructType,
                           conf: ParquetGroups.SerializableConf,
                           queryId: String,
                           targetFileBytes: Long =
                             SnapshotWriteSupport.DefaultTargetFileBytes,
                           upsertKey: Option[String] = None)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwriteV2 {

  // stamp stable field ids BEFORE any file is written (Spark strips
  // metadata from the logical write schema): a V2-appended file into an
  // id-mapped table must carry the table's ids, or an id-enabled read
  // would null-fill it; same-named fields reuse the table's ids, a
  // bootstrap write gets fresh ones, legacy tables stay id-less
  private val schema = Snapshots.withFieldIds(tableDir, schema0)

  private var replace = false
  private var replaceWhere: Option[Array[org.apache.spark.sql.sources.Filter]] =
    None

  /** `INSERT OVERWRITE` / `mode("overwrite")`: the commit publishes a
    * manifest listing ONLY the new files — a REPLACE version, not an
    * erase. Prior versions still time-travel; vacuum reclaims after
    * retention. An empty overwrite publishes a schema-only version (the
    * table reads as empty, never as missing). */
  override def truncate(): WriteBuilder = { replace = true; this }

  // ---- OVERWRITE BY EXPRESSION (`df.writeTo(t).overwrite(cond)` —
  // the daily-partition-reload): ONE commit that deletes the rows the
  // condition matches AND inserts the new data — delete + insert can
  // never be observed apart, and a re-run replaces the same slice
  // idempotently. The V2 entry points are owned directly (NOT the
  // SupportsOverwrite V1 bridge) for the same reason as DELETE: the
  // default PredicateUtils.toV1 conversion is pushdown-grade and can
  // silently WEAKEN the condition (measured — see SnapshotTable), and
  // an overwrite whose delete-half shrank would replace the wrong
  // slice. The strict converter accepts exactly; canOverwrite refuses
  // anything else, failing the statement loudly at analysis.
  override def canOverwrite(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean = V2Filters.strictAll(predicates).isDefined

  override def overwrite(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : WriteBuilder = {
    val v1 = V2Filters.strictAll(predicates).getOrElse(
      throw new IllegalArgumentException(
        "overwrite condition not losslessly translatable: " +
          predicates.mkString(" AND ")))
    // overwrite(TRUE) is a full replace — same commit as truncate()
    if (v1.forall(_ == org.apache.spark.sql.sources.AlwaysTrue)) replace = true
    else replaceWhere = Some(v1)
    this
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = replaceWhere match {
      case Some(filters) =>
        new SnapshotReplaceWhereWrite(tableDir, schema, conf, filters,
          targetFileBytes)
      case None =>
        new SnapshotBatchWrite(tableDir, schema, conf, replace, targetFileBytes)
    }
    override def toStreaming: StreamingWrite = {
      require(!replace && replaceWhere.isEmpty,
        "graft_snapshots streaming writes are append-only (complete/" +
          "update output modes would replace the table every epoch)")
      upsertKey match {
        case Some(k) => new SnapshotUpsertStreamingWrite(tableDir, schema,
          conf, queryId, k, targetFileBytes)
        case None => new SnapshotStreamingWrite(tableDir, schema, conf,
          queryId, targetFileBytes)
      }
    }
    override def description(): String =
      s"graft_snapshots ${
        if (replace) "overwrite"
        else if (replaceWhere.isDefined) "overwrite-where"
        else if (upsertKey.isDefined) s"upsert(${upsertKey.get})"
        else "append"} $tableDir"
  }
}

/** The builder when `option("upsertKey", col)` is set — additionally
  * accepts UPDATE output mode as append
  * ([[org.apache.spark.sql.connector.write.streaming.SupportsStreamingUpdateAsAppend]]):
  * a streaming aggregation's updated rows upsert by their group key,
  * which makes the sink a continuously-maintained aggregate table.
  * The marker rides THIS subclass only: the plain append sink must
  * keep refusing update mode (treating updates as appends there would
  * duplicate keys every epoch). */
class SnapshotUpsertWriteBuilder(tableDir: String, schema0: StructType,
                                 conf: ParquetGroups.SerializableConf,
                                 queryId: String,
                                 targetFileBytes: Long,
                                 key: String)
    extends SnapshotWriteBuilder(tableDir, schema0, conf, queryId,
      targetFileBytes, Some(key))
    with org.apache.spark.sql.internal.connector
      .SupportsStreamingUpdateAsAppend

private[graft] case class FileCommit(path: String, rows: Long)
    extends WriterCommitMessage

/** A task that ROLLED (file-size hygiene) reports every file it wrote. */
private[graft] case class MultiFileCommit(files: Seq[FileCommit])
    extends WriterCommitMessage

private[v2] object SnapshotWriteSupport {

  /** Staging directory for the NEXT version's files — named like the
    * commit path's writer-unique dirs so vacuum's unreferenced-file
    * sweep covers aborted/zombie leftovers. */
  def stagingDir(tableDir: String): String =
    s"$tableDir/data/w-${UUID.randomUUID().toString.take(12)}"

  /** Publish staged files as the next version (previous entries kept
    * by reference). Returns the version, or -1 for an empty write
    * (nothing to publish — an empty append is a no-op, not an empty
    * table version). `epochTag` rides the manifest as its `#epoch=`
    * header (streaming-sink idempotence — atomic with the publish).
    *
    * CAS at cur+1 (ADVICE r13) with AUTO-RETRY: an append derives
    * nothing from the base version except its entry list, which is
    * recomputed per attempt — so when a concurrent commit wins the
    * CREATE_NEW race, this writer re-reads the new current and
    * publishes on top instead of failing the job. Concurrent APPENDERS
    * therefore all succeed (serialized by the CAS); only derived-state
    * commits (DML, replace, maintenance) surface the race to the
    * statement, because their content is stale by construction. */
  def publish(tableDir: String, files: Seq[String],
              epochTag: Option[String] = None): Int = {
    if (files.isEmpty) return -1
    var attempts = 0
    while (true) {
      val cur = Snapshots.currentVersion(tableDir)
      try {
        return Snapshots.commitManifest(tableDir,
          Snapshots.manifestEntries(tableDir, cur) ++ files.sorted,
          expectedVersion = Some(cur), epochTag = epochTag)
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          // zombie-driver guard: if the racer that beat us was a replay
          // of THIS epoch (two drivers committing the same epoch
          // concurrently), retrying would publish the epoch twice —
          // re-check the epoch header and stand down instead
          epochTag.foreach { tag =>
            val cut = tag.lastIndexOf('-')
            if (cut > 0) {
              val (qid, eid) = (tag.substring(0, cut),
                tag.substring(cut + 1).toLong)
              if (Snapshots.lastEpochOf(tableDir, qid).exists(_ >= eid))
                return Snapshots.currentVersion(tableDir)
            }
          }
          attempts += 1
          if (attempts >= 20) throw e
      }
    }
    -1 // unreachable
  }

  def deleteQuietly(conf: Configuration, paths: Seq[String]): Unit =
    paths.foreach { p =>
      val hp = new Path(p)
      try { hp.getFileSystem(conf).delete(hp, false); () }
      catch { case _: Throwable => () }
    }

  /** Spark row schema → parquet message type (the write-side mirror of
    * the reader's supported surface). Fields carrying the standard
    * `parquet.field.id` metadata write their id into the file — the
    * column-id mapping renames/drops resolve against. */
  def messageType(schema: StructType): MessageType = {
    SnapshotsDataSource.validate(schema)
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = fieldType(f.name, f.dataType)
      b.addField(graft.sources.Snapshots.fieldId(f)
        .map(id => t.withId(id)).getOrElse(t))
    }
    b.named("spark_schema")
  }

  private def fieldType(name: String, dt: DataType): Type = dt match {
    case ArrayType(et, _) =>
      Types.optionalList().element(fieldType("element", et)).named(name)
    case _ =>
      val b = dt match {
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new UnsupportedOperationException(
          s"graft_snapshots write: unsupported type $other")
      }
      b.named(name)
  }

  /** One parquet file per task; returns the per-row appender. */
  final class FileWriter(file: String, conf: Configuration,
                         schema: StructType) {
    private val mt = messageType(schema)
    private val factory = new SimpleGroupFactory(mt)
    private val writer: ParquetWriter[Group] =
      ExampleParquetWriter.builder(new Path(file))
        .withType(mt).withConf(conf).build()
    private var rows = 0L

    private val appenders: Array[(Group, InternalRow) => Unit] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        appender(f.name, f.dataType, i)
      }

    def write(row: InternalRow): Unit = {
      val g = factory.newGroup()
      var i = 0
      while (i < appenders.length) {
        if (!row.isNullAt(i)) appenders(i)(g, row)
        i += 1
      }
      writer.write(g)
      rows += 1
    }

    def close(): Long = { writer.close(); rows }

    /** Rows written so far (cheap; rolling cadence). */
    def rowCount: Long = rows

    /** In-flight size estimate (written pages + buffered), the rolling
      * trigger. */
    def dataSize: Long = writer.getDataSize

    private def appender(name: String, dt: DataType, i: Int)
        : (Group, InternalRow) => Unit = dt match {
      case BooleanType => (g, r) => g.add(name, r.getBoolean(i))
      case IntegerType | DateType => (g, r) => g.add(name, r.getInt(i))
      case LongType | TimestampType | TimestampNTZType =>
        (g, r) => g.add(name, r.getLong(i))
      case FloatType => (g, r) => g.add(name, r.getFloat(i))
      case DoubleType => (g, r) => g.add(name, r.getDouble(i))
      case StringType => (g, r) =>
        g.add(name, Binary.fromReusedByteArray(r.getUTF8String(i).getBytes))
      case BinaryType => (g, r) =>
        g.add(name, Binary.fromConstantByteArray(r.getBinary(i)))
      case ArrayType(et, _) =>
        val elem = elementAdder(et)
        (g, r) => {
          val arr = r.getArray(i)
          val outer = g.addGroup(name)
          var j = 0
          while (j < arr.numElements()) {
            val e = outer.addGroup(0)
            if (!arr.isNullAt(j)) elem(e, arr, j)
            j += 1
          }
        }
      case other => throw new UnsupportedOperationException(
        s"graft_snapshots write: unsupported type $other")
    }

    private def elementAdder(et: DataType)
        : (Group, org.apache.spark.sql.catalyst.util.ArrayData, Int) => Unit =
      et match {
        case BooleanType => (e, a, j) => e.add(0, a.getBoolean(j))
        case IntegerType | DateType => (e, a, j) => e.add(0, a.getInt(j))
        case LongType | TimestampType | TimestampNTZType =>
          (e, a, j) => e.add(0, a.getLong(j))
        case FloatType => (e, a, j) => e.add(0, a.getFloat(j))
        case DoubleType => (e, a, j) => e.add(0, a.getDouble(j))
        case StringType => (e, a, j) =>
          e.add(0, Binary.fromReusedByteArray(a.getUTF8String(j).getBytes))
        case other => throw new UnsupportedOperationException(
          s"graft_snapshots write: unsupported array element $other")
      }
  }

  /** Default write-side file-size target. FILE-SIZE HYGIENE at scale:
    * without rolling, one task = one file — a skewed or coalesced task
    * writing 10 GB produces a 10 GB file whose footer stats cover too
    * much to prune and whose read can't parallelize below one task.
    * Overridable per write with `option("targetFileBytes", n)`. */
  val DefaultTargetFileBytes: Long = 512L << 20

  /** Normalize task commit messages to their file list — writers report
    * ONE file ([[FileCommit]]) or a ROLLED sequence ([[MultiFileCommit]]). */
  def committed(messages: Array[WriterCommitMessage]): Seq[FileCommit] =
    messages.toSeq.flatMap {
      case f: FileCommit => Seq(f)
      case MultiFileCommit(fs) => fs
      case other => throw new IllegalStateException(
        s"unexpected commit message $other")
    }

  /** One task's writer, ROLLING at `targetBytes`: the parquet file
    * opens lazily (an empty task stages nothing) and closes + reopens
    * under a `-rN` suffix when the writer's in-flight size passes the
    * target — file sizes stay bounded no matter how skewed the task's
    * input. Size is polled every 512 rows (getDataSize walks column
    * buffers). */
  final class TaskWriter(file: String, conf: Configuration,
                         schema: StructType,
                         targetBytes: Long = DefaultTargetFileBytes)
      extends DataWriter[InternalRow] {
    private val done = scala.collection.mutable.ArrayBuffer.empty[FileCommit]
    private var w: FileWriter = _
    private var cur: String = _
    private var rolled = 0

    private def open(): Unit = {
      cur =
        if (rolled == 0) file
        else s"${file.stripSuffix(".parquet")}-r$rolled.parquet"
      w = new FileWriter(cur, conf, schema)
    }

    override def write(row: InternalRow): Unit = {
      if (w == null) open()
      w.write(row)
      if ((w.rowCount & 511) == 0 && w.dataSize >= targetBytes) {
        done += FileCommit(cur, w.close())
        rolled += 1
        w = null
      }
    }

    override def commit(): WriterCommitMessage = {
      if (w != null) { done += FileCommit(cur, w.close()); w = null }
      done.toSeq match {
        case Seq(one) => one
        case many => MultiFileCommit(many)
      }
    }

    override def abort(): Unit = {
      if (w != null) { w.close(); w = null; done += FileCommit(cur, 0L) }
      deleteQuietly(conf, done.map(_.path).toSeq)
    }

    override def close(): Unit = ()
  }
}

class SnapshotBatchWrite(tableDir: String, schema: StructType,
                         conf: ParquetGroups.SerializableConf,
                         replace: Boolean = false,
                         targetFileBytes: Long =
                           SnapshotWriteSupport.DefaultTargetFileBytes)
    extends BatchWrite {
  private val staging = SnapshotWriteSupport.stagingDir(tableDir)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val dir = staging; val c = conf; val s = schema
    val tb = targetFileBytes
    (partitionId: Int, taskId: Long) =>
      new SnapshotWriteSupport.TaskWriter(
        s"$dir/part-$partitionId-$taskId.parquet", c.value, s, tb)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // only non-empty task outputs are referenced
    val files = SnapshotWriteSupport.committed(messages)
      .collect { case FileCommit(p, rows) if rows > 0 => p }
    if (replace) {
      // REPLACE commit: only the new files. An empty overwrite still
      // needs a readable version — write one schema-only file so the
      // table plans and schema-infers as empty, not as missing.
      // The write schema is recorded in the manifest (an overwrite may
      // legitimately reshape the table).
      val published =
        if (files.nonEmpty) files.sorted
        else {
          val f = s"$staging/part-empty.parquet"
          new SnapshotWriteSupport.FileWriter(f, conf.value, schema).close()
          Seq(f)
        }
      Snapshots.commitManifest(tableDir, published, Some(schema.json))
    } else SnapshotWriteSupport.publish(tableDir, files)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SnapshotWriteSupport.deleteQuietly(conf.value,
      SnapshotWriteSupport.committed(messages).map(_.path))
}

/** The REPLACE-WHERE batch write: tasks stage the new data like any
  * append; the driver commit runs the DELETE half
  * ([[graft.operators.DeleteRows.prepareReplace]] — footer-pruned,
  * DV-aware survivor rewrite) and publishes
  * `kept-by-reference + survivors + new files` as ONE CAS'd manifest
  * version. A crash anywhere before the manifest publish leaves only
  * unreferenced staging (vacuum-swept); no reader can ever see the
  * delete without the insert.
  */
class SnapshotReplaceWhereWrite(tableDir: String, schema: StructType,
                                conf: ParquetGroups.SerializableConf,
                                filters: Array[org.apache.spark.sql.sources.Filter],
                                targetFileBytes: Long =
                                  SnapshotWriteSupport.DefaultTargetFileBytes)
    extends BatchWrite {
  private val staging = SnapshotWriteSupport.stagingDir(tableDir)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val dir = staging; val c = conf; val s = schema
    val tb = targetFileBytes
    (partitionId: Int, taskId: Long) =>
      new SnapshotWriteSupport.TaskWriter(
        s"$dir/part-$partitionId-$taskId.parquet", c.value, s, tb)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = SnapshotWriteSupport.committed(messages)
      .collect { case FileCommit(p, rows) if rows > 0 => p }
    val spark = org.apache.spark.sql.SparkSession.active
    val (baseVersion, kept, survivorsDir) =
      graft.operators.DeleteRows.prepareReplace(spark, tableDir,
        filters.toSeq)
    val entries = (kept ++ survivorsDir.toSeq ++ newFiles).sorted
    val published =
      if (entries.nonEmpty) entries
      else {
        // replaced everything with nothing: schema-only empty version
        val f = s"$staging/part-empty.parquet"
        new SnapshotWriteSupport.FileWriter(f, conf.value, schema).close()
        Seq(f)
      }
    Snapshots.commitManifest(tableDir, published,
      expectedVersion = Some(baseVersion))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SnapshotWriteSupport.deleteQuietly(conf.value,
      SnapshotWriteSupport.committed(messages).map(_.path))
}

class SnapshotStreamingWrite(tableDir: String, schema: StructType,
                             conf: ParquetGroups.SerializableConf,
                             queryId: String,
                             targetFileBytes: Long =
                               SnapshotWriteSupport.DefaultTargetFileBytes)
    extends StreamingWrite {
  private val staging = SnapshotWriteSupport.stagingDir(tableDir)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val dir = staging; val c = conf; val s = schema
    val tb = targetFileBytes
    (partitionId: Int, taskId: Long, epochId: Long) =>
      new SnapshotWriteSupport.TaskWriter(
        s"$dir/part-e$epochId-$partitionId-$taskId.parquet", c.value, s, tb)
  }

  /** Idempotent per epoch — the replay guard is the `#epoch=` header
    * INSIDE the published manifest (atomic with the publish), so each
    * epoch enters the version log exactly once. The marker file is a
    * fast path only and is written AFTER the publish: the previous
    * marker-first design had a crash window (marker durable, manifest
    * not) where the replayed epoch saw the marker and silently dropped
    * its data — marker-after merely costs a manifest header scan on
    * the one replay that races a crash. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage])
      : Unit = {
    val marker = new Path(
      s"$tableDir/_snapshots/epoch-$queryId-$epochId.cmt")
    val fs = marker.getFileSystem(conf.value)
    def dropDuplicates(): Unit = SnapshotWriteSupport.deleteQuietly(
      conf.value, SnapshotWriteSupport.committed(messages).map(_.path))
    def writeMarker(): Unit = {
      fs.mkdirs(marker.getParent)
      try {
        val out = fs.create(marker, false)
        try out.writeBytes(staging) finally out.close()
      } catch { case _: java.io.IOException => () } // raced: already there
    }
    if (fs.exists(marker)) { dropDuplicates(); return }
    // marker missing but the manifest may still hold the epoch (crash
    // after publish, before the marker): the header is the truth
    if (Snapshots.lastEpochOf(tableDir, queryId).exists(_ >= epochId)) {
      writeMarker(); dropDuplicates(); return
    }
    val files = SnapshotWriteSupport.committed(messages)
      .collect { case FileCommit(p, rows) if rows > 0 => p }
    publishEpoch(files, s"$queryId-$epochId")
    // empty epochs publish no manifest; the marker alone records them
    // (a replayed empty epoch re-publishes nothing either way)
    writeMarker()
  }

  /** What a non-replayed epoch's staged files become. Base: an APPEND
    * commit. [[SnapshotUpsertStreamingWrite]] overrides with the
    * key-upsert commit; whatever the override does, the epoch tag MUST
    * ride the published manifest — it IS the replay guard. */
  protected def publishEpoch(files: Seq[String], epochTag: String): Unit = {
    SnapshotWriteSupport.publish(tableDir, files, epochTag = Some(epochTag))
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage])
      : Unit =
    SnapshotWriteSupport.deleteQuietly(conf.value,
      SnapshotWriteSupport.committed(messages).map(_.path))
}

/** The EXACTLY-ONCE STREAMING UPSERT sink (`option("upsertKey", col)`)
  * — CDC apply as a native sink instead of a foreachBatch escape
  * hatch. Each epoch commits ONE manifest version that (a) appends the
  * epoch's rows and (b) suppresses the previously-live rows whose key
  * the epoch carries, via the same `#dv=` deletion-vector mechanism as
  * merge-on-read DML: zero existing files rewrite, the epoch costs
  * O(epoch rows + replaced rows), and delete + insert can never be
  * observed apart. Epoch replay after a crash publishes NOTHING (the
  * inherited `#epoch=` guard), so the upsert is exactly-once
  * end-to-end.
  *
  * Contract: rows WITHIN one epoch must be key-unique (the sink
  * applies the epoch as a set — dedup upstream with the streaming
  * query's own semantics; there is no universal "last" inside a batch
  * without an ordering column). Across epochs, later epochs win.
  * An upsert table is not an append-only stream source — downstream
  * exactly-once readers refuse its DV-growing commits by design.
  *
  * Reference context: this is the streaming half of the reference's
  * DynamoDB upsert consumer
  * (`/root/reference/business_logic/stream_consumer/process_records.py:182`)
  * — the same apply-latest-by-key contract, as one atomic versioned
  * commit per micro-batch.
  */
class SnapshotUpsertStreamingWrite(tableDir: String, schema: StructType,
                                   conf: ParquetGroups.SerializableConf,
                                   queryId: String,
                                   keyCol: String,
                                   targetFileBytes: Long =
                                     SnapshotWriteSupport.DefaultTargetFileBytes)
    extends SnapshotStreamingWrite(tableDir, schema, conf, queryId,
      targetFileBytes) {

  require(schema.fieldNames.contains(keyCol),
    s"upsertKey '$keyCol' is not a column of the write schema " +
      s"(${schema.fieldNames.mkString(", ")})")

  override protected def publishEpoch(files: Seq[String],
                                      epochTag: String): Unit = {
    if (files.isEmpty) return
    val spark = org.apache.spark.sql.SparkSession.active
    val cur = Snapshots.currentVersion(tableDir)
    if (cur == 0) { // bootstrap epoch: nothing to replace
      super.publishEpoch(files, epochTag)
      return
    }
    import org.apache.spark.sql.functions.{broadcast, col, regexp_replace}
    val entries = Snapshots.manifestEntries(tableDir, cur)
    // the epoch's key set (micro-batch-sized) broadcast-semi-joins the
    // table's raw rows: matching (file, position) pairs are the rows
    // this epoch replaces. Raw (not DV-filtered) — already-suppressed
    // positions re-merge to the identical set, never resurrect.
    val keysDf = spark.read.parquet(files: _*).select(col(keyCol)).distinct()
    val raw = Snapshots.schemaOf(tableDir, cur) match {
      case Some(s) if Snapshots.hasFieldIds(s) =>
        Snapshots.idMappedRead(spark, s, entries)
      case Some(s) => spark.read.schema(s).parquet(entries: _*)
      case None => spark.read.parquet(entries: _*)
    }
    val hits = raw
      // metadata columns resolve only directly above the scan — pin
      // them into real columns BEFORE the join consumes the relation
      .select(col(keyCol),
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/").as("f"),
        col("_metadata.row_index").as("p"))
      .join(broadcast(keysDf), Seq(keyCol), "left_semi")
      .select(col("f"), col("p"))
      .collect()
    val fresh: Map[String, Array[Long]] = hits.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    val prev = Snapshots.deletionVectors(tableDir, cur)
    val merged = (prev.keySet ++ fresh.keySet).iterator.map { f =>
      f -> (prev.getOrElse(f, Array.empty[Long]) ++
        fresh.getOrElse(f, Array.empty[Long])).distinct.sorted
    }.toMap
    Snapshots.commitManifest(tableDir, entries ++ files.sorted,
      expectedVersion = Some(cur),
      dv = if (merged.isEmpty) None else Some(merged),
      epochTag = Some(epochTag))
    ()
  }
}
