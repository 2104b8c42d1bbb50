package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{ArrayType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Snapshots

/** DataSource V2 connector over the engine's snapshot tables
  * ([[graft.sources.Snapshots]]) — the standard Spark front door the
  * helper API lacked:
  *
  * {{{
  *   spark.read.format("graft_snapshots").option("path", t)
  *     .option("versionAsOf", 3).load()                 // time travel
  *   spark.readStream.format("graft_snapshots").option("path", t)
  *     .load()                                          // change feed
  *   CREATE TABLE t USING graft_snapshots OPTIONS (path '...')
  * }}}
  *
  * What the connector owns (vs plain `spark.read.parquet` over the
  * manifest, which [[Snapshots.read]] remains for):
  *  - **Version resolution inside the plan**: `versionAsOf` /
  *    `timestampAsOf` options resolve against the manifest log, so the
  *    SAME query text is reproducible against a pinned version — the
  *    training-data-lineage property, now addressable from SQL.
  *  - **Manifest-planned file-level skipping**: pushed-down
  *    comparison filters on long columns are matched against per-file
  *    footer min/max ([[graft.sources.Manifest]]'s stats model), and
  *    non-overlapping files leave the scan PLAN — no task, no open.
  *    (Spark re-applies every filter on the rows, so stats are only
  *    ever a superset bound; the scan `description` exposes
  *    kept/skipped counts for plan assertions.) At 100 TB this is the
  *    difference between scheduling O(matching files) and O(table).
  *  - **Streaming the table as a source** ([[SnapshotMicroBatchStream]]):
  *    offsets are manifest VERSIONS, each micro-batch reads exactly the
  *    files a commit added, checkpoint restart resumes from the
  *    committed version — the Delta-streaming contract (appends stream;
  *    a non-append commit fails loudly unless `ignoreChanges=true`,
  *    which replays rewritten files at-least-once).
  *
  * Executor-side reads are COLUMNAR by default: the partition readers
  * decode through Spark's vectorized parquet reader into
  * ColumnarBatches ([[ParquetGroups.GroupReaderFactory]]), so a SQL
  * user pays the same scan cost as a native parquet read — file
  * skipping, runtime filtering, and time travel come for free on top.
  * `option("vectorizedReader", "false")` falls back to the
  * parquet-hadoop record API row path (also used for deletion-vector
  * reads, where per-row position skipping applies).
  */
class SnapshotsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft_snapshots"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val (dir, version) = SnapshotsDataSource.resolve(options)
    // schema evolution: the manifest log records each version's schema
    // — resolve it there (added columns visible even though older
    // files lack them, pinned versions read with THEIR columns); only
    // pre-evolution tables fall back to single-file inference
    val schema = Snapshots.schemaOf(dir, version).getOrElse {
      val files = SnapshotsDataSource.filesOf(
        spark.sparkContext.hadoopConfiguration,
        Snapshots.manifestEntries(dir, version))
      require(files.nonEmpty, s"snapshot table $dir v$version has no files")
      spark.read.parquet(files.head._1).schema
    }
    SnapshotsDataSource.validate(schema)
    SnapshotsDataSource.withCdfColumns(schema, options)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // when the schema came from CREATE TABLE DDL (external metadata)
    // rather than inferSchema, the CDF columns still need appending
    val full =
      if (schema.fieldNames.contains(ParquetGroups.ChangeTypeCol)) schema
      else SnapshotsDataSource.withCdfColumns(schema, opts)
    new SnapshotTable(full, opts)
  }
}

object SnapshotsDataSource {

  /** The catalog hands `path` back scheme-qualified (`file:/x/y`);
    * the manifest log is plain-filesystem (java.nio) — normalize to a
    * local path and reject non-local schemes loudly. */
  private[v2] def normalizePath(options: CaseInsensitiveStringMap): String = {
    val raw = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft_snapshots requires a path"))
    val uri = new Path(raw).toUri
    require(uri.getScheme == null || uri.getScheme == "file",
      s"graft_snapshots tables live on the local/posix filesystem " +
        s"(the manifest log is nio-based); got scheme ${uri.getScheme}")
    uri.getPath
  }

  /** (tableDir, resolved version) from read options. A non-numeric
    * `versionAsOf` is a TAG name (SQL `VERSION AS OF 'training_run_17'`
    * arrives here through the catalog's string-version overload) —
    * resolved against the table's immutable tag refs. */
  private[v2] def resolve(options: CaseInsensitiveStringMap): (String, Int) = {
    val dir = normalizePath(options)
    val v = Option(options.get("versionAsOf")).map(s =>
        s.toIntOption.getOrElse(Snapshots.resolveTag(dir, s)))
      .orElse(Option(options.get("timestampAsOf")).map { t =>
        val millis = t.toLongOption.getOrElse(
          java.time.Instant.parse(t).toEpochMilli)
        Snapshots.versionAsOf(dir, millis)
      })
      .getOrElse(Snapshots.currentVersion(dir))
    (dir, v)
  }

  /** Expand manifest entries (dirs or single files) to
    * `(path, bytes)` parquet leaves. */
  private[v2] def filesOf(conf: Configuration,
                          entries: Seq[String]): Seq[(String, Long)] =
    entries.flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath.toUri.getPath, s.getLen))
      else Seq((p.toUri.getPath, st.getLen))
    }

  /** Greedy size bins so one task costs ~`targetBytes` of input, not
    * one-file-one-task (the small-file tax at scale). */
  private[v2] def bin(files: Seq[(String, Long)],
                      targetBytes: Long): Seq[ParquetGroups.FileBin] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String], Long)]
    files.sortBy(-_._2).foreach { case (f, sz) =>
      bins.indexWhere(_._2 + sz <= targetBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(f), sz))
        case i =>
          bins(i)._1 += f
          bins(i) = (bins(i)._1, bins(i)._2 + sz)
      }
    }
    bins.map(b => ParquetGroups.FileBin(b._1.toSeq)).toSeq
  }

  private[v2] def validate(schema: StructType): Unit = schema.fields.foreach {
    f =>
      val ok = f.dataType match {
        case ArrayType(et, _) => isAtomic(et)
        case dt => isAtomic(dt)
      }
      require(ok, s"graft_snapshots: column ${f.name} has unsupported " +
        s"type ${f.dataType} (flat relational columns + primitive arrays)")
  }

  private def isAtomic(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           StringType | BinaryType | DateType | TimestampType |
           TimestampNTZType => true
      case _ => false
    }
  }

  /** Per-file [lo, hi] footer stats for several long columns in ONE
    * footer open (the multi-column form of
    * [[graft.sources.Manifest.fileStat]]). Columns with no usable
    * stats report full-range (never skipped).
    */
  private[v2] def longStats(conf: Configuration, file: String,
                            cols: Set[String]): Map[String, (Long, Long)] =
    rangeStats(conf, file, cols, Set.empty).longs

  /** Does every top-level field of `file` carry a parquet field id?
    * (The RENAME/DROP gate — id-less files can only match by name.) */
  private[v2] def fileHasFieldIds(conf: Configuration,
                                  file: String): Boolean = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
      .forall(_.getId != null)
    finally reader.close()
  }

  /** Unsigned lexicographic byte compare — parquet's UNSIGNED binary
    * sort order AND Spark's UTF8String order, so string bounds compare
    * consistently with both the writer's stats and the engine's
    * semantics. */
  private[v2] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Per-file footer [lo, hi] ranges for long AND string columns in ONE
    * footer open. String bounds are raw UTF-8 bytes (parquet may store
    * TRUNCATED binary bounds — truncation keeps them valid supersets:
    * min is cut short, max is cut-and-incremented — so skipping on them
    * is always sound). Columns with no usable stats report None =
    * full-range (never skipped).
    */
  private[v2] case class FileRanges(
      longs: Map[String, (Long, Long)],
      strings: Map[String, Option[(Array[Byte], Array[Byte])]])

  /** Per-file footer stats CACHE, keyed by path. Sound because data
    * files are IMMUTABLE and never rewritten in place (writer-unique
    * staging/version dirs, CREATE_NEW publishes, `-rN` roll suffixes):
    * a path's footer can never change, so its stats are facts. This
    * turns plan-time skipping from O(candidate files) footer opens PER
    * QUERY into per file LIFETIME — the difference between a
    * millisecond plan and a listing storm when the same 100 TB table
    * is queried repeatedly. Bounded crudely: cleared wholesale past
    * 200k entries (entries are tens of bytes; the clear is a cache,
    * not a correctness event). */
  private val footerStatsCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedFooterStats]()
  private[v2] case class CachedFooterStats(
      longs: Map[String, (Long, Long)],
      strings: Map[String, Option[(Array[Byte], Array[Byte])]])

  private def readFooterStats(conf: Configuration,
                              file: String): CachedFooterStats = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      val accL = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val badL = scala.collection.mutable.Set.empty[String]
      val accS =
        scala.collection.mutable.Map.empty[String, (Array[Byte], Array[Byte])]
      // a string column is unusable once ANY row group lacks binary
      // min/max (stats disabled, non-binary type) — all-null groups are
      // fine: they constrain nothing and match nothing
      val badS = scala.collection.mutable.Set.empty[String]
      reader.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          val s = c.getStatistics
          c.getPrimitiveType.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT64 | PrimitiveTypeName.INT32 =>
              if (s == null || s.isEmpty) badL += name
              // an all-null group constrains nothing: no row of it can
              // satisfy a comparison, and only comparisons/IN skip
              // (null-matching filters are never skippable) — and its
              // "min/max" are uninitialized zeros, phantom widening
              else if (!s.hasNonNullValue) ()
              else {
                val lo = s.genericGetMin.asInstanceOf[Number].longValue
                val hi = s.genericGetMax.asInstanceOf[Number].longValue
                val (plo, phi) =
                  accL.getOrElse(name, (Long.MaxValue, Long.MinValue))
                accL(name) = (math.min(plo, lo), math.max(phi, hi))
              }
            case PrimitiveTypeName.BINARY if !badS.contains(name) =>
              if (s == null) { badS += name; () }
              else if (s.isEmpty || !s.hasNonNullValue) () // all-null group
              else (s.genericGetMin, s.genericGetMax) match {
                case (mn: org.apache.parquet.io.api.Binary,
                      mx: org.apache.parquet.io.api.Binary) =>
                  val lo = mn.getBytes; val hi = mx.getBytes
                  accS.get(name) match {
                    case None => accS(name) = (lo, hi)
                    case Some((plo, phi)) => accS(name) = (
                      if (cmpBytes(lo, plo) < 0) lo else plo,
                      if (cmpBytes(hi, phi) > 0) hi else phi)
                  }
                case _ => badS += name; ()
              }
            case _ => ()
          }
        }
      }
      CachedFooterStats(
        accL.iterator.map { case (n, r) =>
          n -> (if (badL.contains(n)) (Long.MinValue, Long.MaxValue) else r)
        }.toMap ++ badL.iterator.map(
          _ -> (Long.MinValue, Long.MaxValue)).toMap,
        accS.iterator.map { case (n, r) =>
          n -> (if (badS.contains(n)) None else Some(r))
        }.toMap -- badS)
    } finally reader.close()
  }

  private[v2] def rangeStats(conf: Configuration, file: String,
                             longCols: Set[String],
                             stringCols: Set[String]): FileRanges = {
    if (footerStatsCache.size() > 200000) footerStatsCache.clear()
    val cached = footerStatsCache.computeIfAbsent(file,
      f => readFooterStats(conf, f))
    FileRanges(
      // a column the file lacks (schema evolution) or carries no stats
      // for: full range / no bounds — a bound is a fact, never a guess
      longCols.iterator.map(c =>
        c -> cached.longs.getOrElse(c, (Long.MinValue, Long.MaxValue))).toMap,
      stringCols.iterator.map(c =>
        c -> cached.strings.getOrElse(c, None)).toMap)
  }

  /** Per-column footer aggregate state; `hasMinMax` is false when any
    * row group lacks usable stats (all-null pages, stats disabled). */
  private[v2] case class ColAgg(lo: Long, hi: Long, nulls: Long,
                                hasMinMax: Boolean, nullsKnown: Boolean)
  private[v2] case class FileAgg(rows: Long, cols: Map[String, ColAgg])

  /** One footer open: row count + per-column min/max/null-count. */
  private[v2] def footerAgg(conf: Configuration, file: String,
                            cols: Set[String]): FileAgg = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      var rows = 0L
      val acc = scala.collection.mutable.Map.empty[String, ColAgg]
      reader.getFooter.getBlocks.asScala.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          if (cols.contains(name)) {
            val s = c.getStatistics
            val prev = acc.getOrElse(name,
              ColAgg(Long.MaxValue, Long.MinValue, 0L, hasMinMax = true,
                nullsKnown = true))
            acc(name) =
              if (s == null) prev.copy(hasMinMax = false, nullsKnown = false)
              else {
                val nullsKnown = prev.nullsKnown && s.isNumNullsSet
                val nulls = prev.nulls + (if (s.isNumNullsSet) s.getNumNulls else 0L)
                if (s.isEmpty || !s.hasNonNullValue)
                  // no values in this group: min/max unusable only if
                  // the group actually holds non-null rows unaccounted
                  ColAgg(prev.lo, prev.hi, nulls,
                    prev.hasMinMax && s.isNumNullsSet &&
                      s.getNumNulls == b.getRowCount,
                    nullsKnown)
                else (s.genericGetMin, s.genericGetMax) match {
                  // min/max only usable for integral columns (the only
                  // types the agg layer accepts); string/binary stats
                  // still contribute their null counts for COUNT(col)
                  case (mn: Number, mx: Number) => ColAgg(
                    math.min(prev.lo, mn.longValue),
                    math.max(prev.hi, mx.longValue),
                    nulls, prev.hasMinMax, nullsKnown)
                  case _ =>
                    ColAgg(prev.lo, prev.hi, nulls, hasMinMax = false,
                      nullsKnown)
                }
              }
          }
        }
      }
      FileAgg(rows, cols.iterator.map(c => c -> acc.getOrElse(c,
        ColAgg(Long.MaxValue, Long.MinValue, 0L, hasMinMax = false,
          nullsKnown = false))).toMap)
    } finally reader.close()
  }

  /** Output schema of a completely-pushed aggregation, in Spark's
    * expected shape: counts are long, min/max keep the column type. */
  private[v2] def aggSchema(schema: StructType, agg: Aggregation): StructType = {
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression) =
      schema(e.asInstanceOf[NamedReference].fieldNames.head)
    StructType(agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) =>
        org.apache.spark.sql.types.StructField(s"count_star_$i", LongType,
          nullable = false)
      case (c: Count, i) =>
        org.apache.spark.sql.types.StructField(s"count_$i", LongType,
          nullable = false)
      case (m: Min, i) => org.apache.spark.sql.types.StructField(
        s"min_$i", fieldOf(m.column).dataType)
      case (m: Max, i) => org.apache.spark.sql.types.StructField(
        s"max_$i", fieldOf(m.column).dataType)
      case (other, _) => throw new IllegalStateException(
        s"unservable aggregate accepted: $other")
    })
  }

  /** The single result row of a pushed aggregation, computed from the
    * footer sweep — the 100 TB `count(*)` that reads zero data pages. */
  private[v2] def aggRow(schema: StructType, agg: Aggregation,
                         files: Seq[FileAgg]): InternalRow = {
    def name(e: org.apache.spark.sql.connector.expressions.Expression) =
      e.asInstanceOf[NamedReference].fieldNames.head
    def isInt(c: String) =
      schema(c).dataType == org.apache.spark.sql.types.IntegerType
    val totalRows = files.iterator.map(_.rows).sum
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => totalRows
      case c: Count =>
        totalRows - files.iterator.map(_.cols(name(c.column)).nulls).sum
      case m: Min =>
        val col = name(m.column)
        val present = files.filter(f => f.rows > f.cols(col).nulls)
        if (present.isEmpty) null
        else {
          val v = present.iterator.map(_.cols(col).lo).min
          if (isInt(col)) v.toInt else v
        }
      case m: Max =>
        val col = name(m.column)
        val present = files.filter(f => f.rows > f.cols(col).nulls)
        if (present.isEmpty) null
        else {
          val v = present.iterator.map(_.cols(col).hi).max
          if (isInt(col)) v.toInt else v
        }
      case other => throw new IllegalStateException(
        s"unservable aggregate accepted: $other")
    }
    new GenericInternalRow(values)
  }

  /** Append the change-feed metadata columns when
    * `readChangeFeed=true` (the Delta CDF column vocabulary). */
  private[v2] def withCdfColumns(schema: StructType,
                                 options: CaseInsensitiveStringMap)
      : StructType =
    if (!options.getBoolean("readChangeFeed", false)) schema
    else StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        ParquetGroups.ChangeTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        ParquetGroups.CommitVersionCol, LongType)))

  /** Ship-a-row partition for completely-pushed aggregates. */
  private[v2] case class PrecomputedRow(row: GenericInternalRow)
      extends InputPartition

  private[v2] object PrecomputedRowReaderFactory
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean =
          if (emitted) false else { emitted = true; true }
        override def get(): InternalRow =
          p.asInstanceOf[PrecomputedRow].row
        override def close(): Unit = ()
      }
  }

  /** Can a file with the given footer ranges possibly satisfy `f`?
    * Long comparisons check the numeric [lo, hi]; string comparisons
    * check the (possibly truncated — still a valid superset) binary
    * bounds in unsigned byte order. Anything else: maybe. */
  private[v2] def mightMatch(r: FileRanges, f: Filter): Boolean = {
    def str(c: String): Option[(Array[Byte], Array[Byte])] =
      r.strings.get(c).flatten
    def bytes(v: String): Array[Byte] =
      v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    f match {
      case EqualTo(c, v: Long) =>
        r.longs.get(c).forall { case (lo, hi) => lo <= v && v <= hi }
      case GreaterThan(c, v: Long) => r.longs.get(c).forall(_._2 > v)
      case GreaterThanOrEqual(c, v: Long) => r.longs.get(c).forall(_._2 >= v)
      case LessThan(c, v: Long) => r.longs.get(c).forall(_._1 < v)
      case LessThanOrEqual(c, v: Long) => r.longs.get(c).forall(_._1 <= v)
      case EqualTo(c, v: String) => str(c).forall { case (lo, hi) =>
        cmpBytes(lo, bytes(v)) <= 0 && cmpBytes(bytes(v), hi) <= 0 }
      case GreaterThan(c, v: String) =>
        str(c).forall(b => cmpBytes(b._2, bytes(v)) > 0)
      case GreaterThanOrEqual(c, v: String) =>
        str(c).forall(b => cmpBytes(b._2, bytes(v)) >= 0)
      case LessThan(c, v: String) =>
        str(c).forall(b => cmpBytes(b._1, bytes(v)) < 0)
      case LessThanOrEqual(c, v: String) =>
        str(c).forall(b => cmpBytes(b._1, bytes(v)) <= 0)
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        str(c).forall { case (lo, hi) => vs.exists { case v: String =>
          cmpBytes(lo, bytes(v)) <= 0 && cmpBytes(bytes(v), hi) <= 0 } }
      case _ => true
    }
  }

  /** Spec/plan observability for RUNTIME file skipping: last
    * (kept, skipped) census per table dir, recorded when a runtime
    * IN-filter re-plans the scan's partitions. `description()` cannot
    * carry it — explain strings render before execution, and runtime
    * filters only arrive at execution time. */
  private[graft] val runtimeSkipCensus =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  /** The filters the file-skip layer understands: single long- or
    * string-column comparisons against a matching literal (plus string
    * IN — the `lang IN ('en','de')` curation shape). */
  private[v2] def skippable(schema: StructType, f: Filter): Boolean = {
    def longCol(c: String) =
      schema.fields.exists(x => x.name == c && x.dataType == LongType)
    def strCol(c: String) = schema.fields.exists(x =>
      x.name == c && x.dataType == org.apache.spark.sql.types.StringType)
    f match {
      case EqualTo(c, _: Long) => longCol(c)
      case GreaterThan(c, _: Long) => longCol(c)
      case GreaterThanOrEqual(c, _: Long) => longCol(c)
      case LessThan(c, _: Long) => longCol(c)
      case LessThanOrEqual(c, _: Long) => longCol(c)
      case EqualTo(c, _: String) => strCol(c)
      case GreaterThan(c, _: String) => strCol(c)
      case GreaterThanOrEqual(c, _: String) => strCol(c)
      case LessThan(c, _: String) => strCol(c)
      case LessThanOrEqual(c, _: String) => strCol(c)
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        strCol(c)
      case _ => false
    }
  }
}

/** The V2 table: batch reads (with time travel + file skipping) and
  * micro-batch streaming of the commit feed.
  */
class SnapshotTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  override def name(): String = s"graft_snapshots(${options.get("path")})"

  override def schema(): StructType = schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE,
      // overwrite-by-expression (writeTo(...).overwrite(cond)): the
      // REPLACE-WHERE commit — delete + insert as one atomic version
      TableCapability.OVERWRITE_BY_FILTER,
      // MERGE WITH SCHEMA EVOLUTION: the analyzer alters the target
      // (our ADD COLUMNS — a zero-data-movement metadata commit) before
      // planning the row-level write
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(schema,
      // merge table-level options with per-read ones (per-read wins)
      new CaseInsensitiveStringMap({
        val m = new util.HashMap[String, String](options)
        m.putAll(o)
        m
      }))

  // ---- SQL `DELETE FROM t WHERE …` — routed onto the copy-on-write
  // surgery ([[graft.operators.DeleteRows.deleteWhere]]): long-column
  // conjuncts prune untouched files via footer stats, survivors rewrite
  // into the next version, prior versions still time-travel. Only
  // whole-filter-translatable predicates are accepted (Spark fails the
  // statement at analysis otherwise, rather than half-deleting); a
  // version-pinned relation refuses (history is immutable).
  // A table opened with `dmlMode 'merge-on-read'` (the Delta
  // enableDeletionVectors table-property shape) routes the same
  // statement onto the DELETION-VECTOR path instead
  // ([[graft.operators.DeleteRows.deleteWhereWithVectors]]): matching
  // positions record in a `#dv=` sidecar, ZERO data files rewrite —
  // the right trade for narrow deletes on large files; `CALL
  // system.compact` reconciles back to the vectorized layout.
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !options.containsKey("versionAsOf") &&
      !options.containsKey("timestampAsOf") &&
      filters.forall(graft.operators.DeleteRows.translatable)

  // The V2-predicate entry points are OWNED here rather than inherited:
  // SupportsDelete's default bridge converts through Spark's
  // PredicateUtils.toV1, which is built for SCAN pushdown where a
  // weaker filter is sound (rows are re-filtered above) — but a DELETE
  // condition is exact semantics, and the default conversion can be
  // LOSSY without failing the length check (measured on Spark 4.1:
  // `(doc_id % 100 = 7) OR (doc_id > 5800)` arrives at the V1
  // deleteWhere as just `GreaterThan(doc_id, 5800)` — a silently wrong
  // delete). [[V2Filters.strict]] converts losslessly or refuses, so an
  // inexpressible condition falls back to the row-level ReplaceData
  // plan instead of deleting the wrong rows.
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    V2Filters.strictAll(predicates) match {
      case Some(v1) => canDeleteWhere(v1)
      case None => false
    }

  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    deleteWhere(V2Filters.strictAll(predicates).getOrElse(
      throw new IllegalArgumentException(
        "DELETE condition not losslessly translatable: " +
          predicates.mkString(" AND "))))

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(!options.containsKey("versionAsOf") &&
      !options.containsKey("timestampAsOf"),
      "DELETE from a version-pinned snapshot relation: history is immutable")
    val dir = SnapshotsDataSource.normalizePath(options)
    val spark = SparkSession.active
    Option(options.get("dmlMode")).map(_.toLowerCase) match {
      case Some("merge-on-read") =>
        val cond = filters.map(f =>
          graft.operators.DeleteRows.toCondition(f).getOrElse(
            throw new IllegalArgumentException(
              s"DELETE predicate not translatable by this table: $f")))
          .reduceOption(_ && _)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        graft.operators.DeleteRows.deleteWhereWithVectors(spark, dir, cond)
      case Some(other) if other != "copy-on-write" =>
        throw new IllegalArgumentException(
          s"unknown dmlMode '$other' (copy-on-write | merge-on-read)")
      case _ =>
        graft.operators.DeleteRows.deleteWhere(spark, dir, filters.toSeq)
    }
    ()
  }

  // ---- metadata columns: `_file` — per-row file provenance
  // (`SELECT _file, * FROM t` — the `_metadata.file_path` idiom,
  // connector-served). Row-level DML requires it (see below), and it
  // doubles as the audit column for copy-on-write surgery tests.
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (schema.fieldNames.contains(ParquetGroups.FilePathCol)) Array.empty
    else Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = ParquetGroups.FilePathCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "path of the parquet file the row was read from"
      },
      // (_file, _pos) = the row id of delta-based row-level DML (the
      // `_metadata.row_index` idiom): projecting it sends the scan down
      // the row-reading path — it is a per-row value, DML-sized reads
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = ParquetGroups.RowPosCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "row ordinal within the parquet file (deletion-vector space)"
      })

  // ---- SQL `UPDATE` / `MERGE INTO` — group-based (copy-on-write)
  // row-level operations: Spark rewrites the statement into ONE scan of
  // the affected file-groups feeding a replace-groups write (see
  // [[SnapshotRowLevelOperation]]). Version-pinned relations refuse:
  // history is immutable.
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(!options.containsKey("versionAsOf") &&
      !options.containsKey("timestampAsOf"),
      s"${info.command} on a version-pinned snapshot relation: " +
        "history is immutable")
    // `dmlMode 'merge-on-read'` swaps the whole rewrite family: the
    // analyzer plans WriteDelta (position deltas against (_file, _pos)
    // row ids — zero file rewrites, see [[SnapshotDeltaOperation]])
    // instead of ReplaceData (file-granular copy-on-write)
    val mor = Option(options.get("dmlMode"))
      .exists(_.equalsIgnoreCase("merge-on-read"))
    () =>
      if (mor) new SnapshotDeltaOperation(
        SnapshotsDataSource.normalizePath(options), schema,
        new ParquetGroups.SerializableConf(
          SparkSession.active.sparkContext.hadoopConfiguration),
        info.command, options)
      else new SnapshotRowLevelOperation(
        SnapshotsDataSource.normalizePath(options), schema,
        new ParquetGroups.SerializableConf(
          SparkSession.active.sparkContext.hadoopConfiguration),
        info.command, options)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val dir = SnapshotsDataSource.normalizePath(
      if (info.options.containsKey("path")) info.options else options)
    val c = new ParquetGroups.SerializableConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    // file-size hygiene: tasks ROLL their output at this many bytes
    val tb = info.options.getLong("targetFileBytes",
      SnapshotWriteSupport.DefaultTargetFileBytes)
    // streaming upsert sink (CDC apply): per-epoch key-upsert commits
    Option(info.options.get("upsertKey"))
      .orElse(Option(options.get("upsertKey"))) match {
      case Some(k) =>
        new SnapshotUpsertWriteBuilder(dir, info.schema(), c,
          info.queryId(), tb, k)
      case None =>
        new SnapshotWriteBuilder(dir, info.schema(), c, info.queryId(), tb)
    }
  }
}

class SnapshotScanBuilder(fullSchema: StructType,
                          options: CaseInsensitiveStringMap,
                          rowLevel: Option[RowLevelScanListener] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var skipFilters: Array[Filter] = Array.empty
  private var sawFilters = false
  private var pushedAgg: Option[Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the table's declared types; Spark hands back a subset.
    // Under a complete aggregate pushdown the "columns" are the
    // aggregate outputs — keep the agg schema untouched then.
    // Metadata columns (`_file`) are not in the table schema but may be
    // requested; the reader emits all metadata slots AFTER the data
    // columns, so readSchema orders them last to match.
    if (pushedAgg.isEmpty) {
      val (meta, data) = requiredSchema.fields.partition(f =>
        f.name == ParquetGroups.FilePathCol ||
          f.name == ParquetGroups.RowPosCol)
      required = StructType(
        data.flatMap(f => fullSchema.fields.find(_.name == f.name)) ++ meta)
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    skipFilters = filters.filter(SnapshotsDataSource.skippable(fullSchema, _))
    // file-level stats are a superset bound, never an exact evaluation:
    // hand every filter back so Spark re-applies them on the rows
    filters
  }

  override def pushedFilters(): Array[Filter] = skipFilters

  // ---- AGGREGATE pushdown: global COUNT/MIN/MAX served from parquet
  // FOOTERS — the scan never reads a data page. Complete pushdown
  // only (no partial form), and only when NO filter survives above the
  // scan (Spark only attempts it then; the sawFilters guard makes the
  // invariant local too — a footer aggregate cannot see row filters).
  // MIN/MAX additionally require every file to carry non-empty stats
  // for the column (checked eagerly against the resolved version's
  // footers before accepting); COUNT(col) requires null counts.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushedAgg.isDefined || canServe(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canServe(agg)) return false
    pushedAgg = Some(agg)
    required = SnapshotsDataSource.aggSchema(fullSchema, agg)
    true
  }

  // footer sweep of the resolved version, shared between the
  // accept-check and execution (one open per file, all columns at once)
  private var aggFiles: Seq[SnapshotsDataSource.FileAgg] = Nil

  private def canServe(agg: Aggregation): Boolean = {
    // a row-level operation's scan must hand back full file-group rows;
    // a footer-served aggregate has no rows to copy through the rewrite
    if (rowLevel.isDefined) return false
    if (sawFilters || agg.groupByExpressions.nonEmpty) return false
    // a version with deletion vectors cannot serve aggregates from
    // footers: the footer counts include merge-on-read-suppressed rows
    if ({
      val (dir, version) = SnapshotsDataSource.resolve(options)
      Snapshots.deletionVectors(dir, version).nonEmpty
    }) return false
    def col(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        Some(n.fieldNames.head)
      case _ => None
    }
    def longOrInt(c: String) = fullSchema.fields.exists(f =>
      f.name == c && (f.dataType == LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType))
    // shape check first (cheap), then one footer sweep
    val needed: Option[Set[String]] =
      agg.aggregateExpressions.foldLeft(Option(Set.empty[String])) {
        case (None, _) => None
        case (acc, _: CountStar) => acc
        case (acc, c: Count) if !c.isDistinct =>
          col(c.column).filter(fullSchema.fieldNames.contains)
            .flatMap(n => acc.map(_ + n))
        case (acc, m: Min) => col(m.column).filter(longOrInt)
          .flatMap(n => acc.map(_ + n))
        case (acc, m: Max) => col(m.column).filter(longOrInt)
          .flatMap(n => acc.map(_ + n))
        case _ => None
      }
    needed match {
      case None => false
      case Some(cols) =>
        val conf = SparkSession.active.sparkContext.hadoopConfiguration
        val (dir, version) = SnapshotsDataSource.resolve(options)
        aggFiles = SnapshotsDataSource.filesOf(conf,
            Snapshots.manifestEntries(dir, version))
          .map(f => SnapshotsDataSource.footerAgg(conf, f._1, cols))
        agg.aggregateExpressions.forall {
          case _: CountStar => true
          case c: Count => col(c.column).exists(n =>
            aggFiles.forall(_.cols(n).nullsKnown))
          case m: Min => col(m.column).exists(n =>
            aggFiles.forall(_.cols(n).hasMinMax))
          case m: Max => col(m.column).exists(n =>
            aggFiles.forall(_.cols(n).hasMinMax))
          case _ => false
        }
    }
  }

  override def build(): Scan = new SnapshotScan(fullSchema, required,
    skipFilters, pushedAgg.map(a => (a, aggFiles)), options, rowLevel)
}

class SnapshotScan(fullSchema: StructType, required: StructType,
                   skipFilters: Array[Filter],
                   pushedAgg: Option[(Aggregation,
                     Seq[SnapshotsDataSource.FileAgg])],
                   options: CaseInsensitiveStringMap,
                   rowLevel: Option[RowLevelScanListener] = None)
    extends Scan
    with SupportsRuntimeFiltering with SupportsReportStatistics
    with SupportsReportPartitioning {

  private val spark = SparkSession.active
  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private lazy val (tableDir, version) = SnapshotsDataSource.resolve(options)
  // (kept, skipped) — resolved once, shared by toBatch and description
  private lazy val planned: (Seq[(String, Long)], Int) = {
    val all = SnapshotsDataSource.filesOf(hadoopConf,
      graft.sources.Snapshots.manifestEntries(tableDir, version))
    if (skipFilters.isEmpty) (all, 0)
    else {
      val cols = skipFilters.flatMap(_.references).toSet
      def typed(dt: org.apache.spark.sql.types.DataType): Set[String] =
        cols.filter(c => fullSchema.fields.exists(f =>
          f.name == c && f.dataType == dt))
      val (longCols, strCols) = (typed(LongType),
        typed(org.apache.spark.sql.types.StringType))
      val kept = all.filter { case (f, _) =>
        val st = SnapshotsDataSource.rangeStats(hadoopConf, f,
          longCols, strCols)
        skipFilters.forall(SnapshotsDataSource.mightMatch(st, _))
      }
      (kept, all.size - kept.size)
    }
  }

  // ---- RUNTIME filtering (the V2 face of dynamic partition pruning):
  // declaring the long columns as filterable lets Catalyst's
  // PartitionPruning rule wire a DynamicPruningSubquery from the
  // OTHER side of a join — at execution BatchScanExec evaluates the
  // build side (reusing its broadcast), hands the join-key values back
  // as an IN filter, and RE-PLANS this scan's partitions. Files whose
  // footer [min,max] contains none of the values leave the plan before
  // a single task launches — the join itself still filters rows, so
  // footer containment being a superset bound never changes semantics.
  // At 100 TB this is the fact-table scan shrinking to the dim
  // selection's key range with zero manual predicate plumbing.
  @volatile private var runtimeIn: Map[String, Array[Long]] = Map.empty
  // string-keyed runtime IN sets (UTF-8 bytes, sorted unsigned) — the
  // `source = '…'` / `lang = '…'` dim-join pruning shape
  @volatile private var runtimeInStr: Map[String, Array[Array[Byte]]] =
    Map.empty

  override def filterAttributes(): Array[NamedReference] =
    // footer-agg scans ship a precomputed row (nothing to prune).
    // Only PROJECTED long columns are declared: Spark resolves these
    // against the scan's (pruned) output, so a filterable-but-unread
    // column would make PartitionPruning's ref resolution throw on any
    // join over this scan
    if (pushedAgg.isDefined) Array.empty
    // Row-level (UPDATE/MERGE) scans declare `_file` — their GROUP id —
    // as the ONLY runtime-filterable attribute. Spark's
    // RowLevelOperationRuntimeGroupFiltering plans a SEPARATE
    // matching-rows subquery (a fresh DataSourceV2Relation.newInstance
    // over the table's plain scan, so it never disturbs this
    // operation's group record) and hands back `_file IN (...)`: the
    // exact set of files containing rows the DML touches. A MERGE then
    // rewrites O(matching files), not O(table). A single attribute
    // matters — with several, the rule builds a struct-IN no V1 filter
    // can express and the scan would silently never prune. The
    // replaced set stays exactly the scanned set because the group
    // record is (re)taken at the post-filter planInputPartitions call,
    // the one whose partitions execute and feed the replacement write.
    else if (rowLevel.isDefined)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(ParquetGroups.FilePathCol))
    else required.fields.filter(f => (f.dataType == LongType ||
        f.dataType == org.apache.spark.sql.types.StringType) &&
        f.name != ParquetGroups.FilePathCol &&
        f.name != ParquetGroups.RowPosCol) // metadata slots: no footer stats
      .map(f => org.apache.spark.sql.connector.expressions.Expressions
        .column(f.name))

  // exact file-name runtime filter (row-level group pruning): the
  // matching-rows subquery's DISTINCT `_file` values
  @volatile private var runtimeFiles: Option[Set[String]] = None

  override def filter(filters: Array[Filter]): Unit = {
    runtimeIn = filters.collect {
      case In(c, vs) if fullSchema.fields.exists(f =>
          f.name == c && f.dataType == LongType) =>
        c -> vs.collect { case n: Number => n.longValue }.sorted
    }.toMap.filter(_._2.nonEmpty)
    runtimeInStr = filters.collect {
      case In(c, vs) if c != ParquetGroups.FilePathCol &&
          fullSchema.fields.exists(f => f.name == c &&
            f.dataType == org.apache.spark.sql.types.StringType) =>
        c -> vs.collect { case s: String =>
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }.sortWith(SnapshotsDataSource.cmpBytes(_, _) < 0)
    }.toMap.filter(_._2.nonEmpty)
    filters.foreach {
      case In(c, vs) if c == ParquetGroups.FilePathCol =>
        // an EMPTY matching set is meaningful here: no file holds a
        // matching row, so the rewrite plans zero groups
        runtimeFiles = Some(vs.collect { case s: String => s }.toSet)
      case _ => ()
    }
  }

  /** Apply the runtime IN-sets to the statically-planned file list:
    * keep a file iff, for EVERY filtered column, at least one IN value
    * lands inside the file's footer [lo, hi]. One footer open per file
    * covers all filtered columns. */
  private def runtimeKept(files0: Seq[(String, Long)]): Seq[(String, Long)] = {
    // exact group filter first (no footer open — the values ARE paths)
    val files = runtimeFiles match {
      case Some(names) =>
        val kept = files0.filter(f => names.contains(f._1))
        SnapshotsDataSource.runtimeSkipCensus.put(
          tableDir, (kept.size, files0.size - kept.size))
        kept
      case None => files0
    }
    if (runtimeIn.isEmpty && runtimeInStr.isEmpty) files
    else {
      val kept = files.filter { case (f, _) =>
        val st = SnapshotsDataSource.rangeStats(hadoopConf, f,
          runtimeIn.keySet, runtimeInStr.keySet)
        runtimeIn.forall { case (c, vals) =>
          val (lo, hi) = st.longs(c)
          // vals sorted: the smallest value ≥ lo decides containment
          val i = java.util.Arrays.binarySearch(vals, lo)
          val idx = if (i >= 0) i else -i - 1
          idx < vals.length && vals(idx) <= hi
        } && runtimeInStr.forall { case (c, vals) =>
          st.strings(c) match {
            case None => true // no usable bounds: never prune
            case Some((lo, hi)) => vals.exists(v =>
              SnapshotsDataSource.cmpBytes(lo, v) <= 0 &&
                SnapshotsDataSource.cmpBytes(v, hi) <= 0)
          }
        }
      }
      SnapshotsDataSource.runtimeSkipCensus.put(
        tableDir, (kept.size, files.size - kept.size))
      kept
    }
  }

  // ---- STORAGE-PARTITIONED reads: when the resolved version carries a
  // BucketLayout sidecar covering EXACTLY its manifest entries (i.e. no
  // commit landed since the OPTIMIZE CLUSTER BY), the scan reports
  // KeyGroupedPartitioning(bucket(n, col)) and emits one
  // HasPartitionKey partition per bucket — two co-clustered tables read
  // through [[SnapshotCatalog]] then JOIN WITH ZERO SHUFFLE
  // (SPARK-37377). A stale or absent sidecar reports unknown
  // partitioning: appends lose the property, they never corrupt it.
  // The bucket column must survive projection (Spark resolves the
  // transform against readSchema), and a pushed-down aggregate ships a
  // single row (nothing left to co-partition).
  private lazy val bucketLayout: Option[BucketLayout.Spec] =
    // row-level rewrites read per-file (the file IS the replace group);
    // the new version's sidecar is stale anyway until the next OPTIMIZE
    if (pushedAgg.isDefined || rowLevel.isDefined) None
    else BucketLayout.read(tableDir, version).filter { bs =>
      bs.entries.keySet ==
        graft.sources.Snapshots.manifestEntries(tableDir, version).toSet &&
        required.fieldNames.contains(bs.col)
    }

  override def outputPartitioning(): Partitioning = bucketLayout match {
    case Some(bs) => new KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .bucket(bs.n, bs.col)), bs.n)
    case None => new UnknownPartitioning(0)
  }

  // ---- statistics: the manifest knows the resolved version's exact
  // byte size for free (file lengths were listed for planning anyway),
  // so report it instead of Spark's "unknown = huge" default — a small
  // snapshot table becomes auto-broadcastable on real numbers, and AQE
  // sizes its shuffles from the true scan volume. Static skip filters
  // are already reflected (planned prunes first).
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        if (pushedAgg.isDefined) 64L else math.max(1L, planned._1.map(_._2).sum))
    override def numRows(): java.util.OptionalLong =
      if (pushedAgg.isDefined) java.util.OptionalLong.of(1L)
      else java.util.OptionalLong.empty()
  }

  override def readSchema(): StructType = required

  override def description(): String = pushedAgg match {
    case Some((agg, files)) =>
      s"graft_snapshots $tableDir v$version FOOTER-AGG " +
        s"over=${files.size} files, zero data pages, " +
        s"agg=[${agg.aggregateExpressions.mkString(", ")}]"
    case None =>
      val (kept, skipped) = planned
      s"graft_snapshots $tableDir v$version files=${kept.size} " +
        s"skipped=$skipped pushed=[${skipFilters.mkString(", ")}]"
  }

  override def toBatch: Batch = {
    require(!options.getBoolean("readChangeFeed", false),
      "readChangeFeed is a STREAMING read option (batch reads of a " +
        "version have no change attribution); use readStream")
    toBatchImpl
  }

  private def toBatchImpl: Batch = pushedAgg match {
    case Some((agg, files)) =>
      // the whole result is one row computed from footers on the
      // driver; the single "partition" just replays it on an executor
      val row = SnapshotsDataSource.aggRow(fullSchema, agg, files)
        .copy() // detach from any buffer before shipping in the task
      val schema = required
      new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          Array(SnapshotsDataSource.PrecomputedRow(
            row.asInstanceOf[GenericInternalRow]))
        override def createReaderFactory(): PartitionReaderFactory =
          SnapshotsDataSource.PrecomputedRowReaderFactory
      }
    case None => new Batch {
      // the version's merge-on-read deletion vectors: attached to the
      // bins holding the touched files (the row readers skip the
      // positions), and the reason a DV'd scan plans row-based
      private val dvMap = Snapshots.deletionVectors(tableDir, version)
      private def withDv(bin: ParquetGroups.FileBin): ParquetGroups.FileBin =
        if (dvMap.isEmpty) bin
        else bin.copy(dv = dvMap.filter { case (f, _) =>
          bin.files.contains(f) })
      // re-planned AFTER SupportsRuntimeFiltering.filter(): BatchScanExec
      // calls toBatch.planInputPartitions() again once runtime IN-sets
      // arrive, so the binning must read `runtimeIn` at call time
      override def planInputPartitions(): Array[InputPartition] = {
        val files = runtimeKept(planned._1)
        // UPDATE/MERGE contract: the files planned here are exactly the
        // groups the commit will replace (recorded driver-side, always
        // before the write commits — the scan feeds the written rows)
        rowLevel.foreach(_.record(version, files.map(_._1)))
        bucketLayout match {
          case Some(bs) =>
            // one partition PER FILE, tagged with its bucket key, plus
            // an empty partition for any bucket left with no files.
            // Spark groups key-equal partitions into one co-located
            // task (a task reads a Seq of partitions), so a bucket
            // split into many files by maxRecordsPerFile still joins
            // exchange-free; and both sides always present the full
            // partition-value set even when file skipping emptied a
            // bucket. Per-file emission also positions the scan for
            // the partially-clustered SPJ mode, where Spark splits a
            // skewed key across tasks instead of grouping it.
            val byBucket = files.groupBy { case (f, _) =>
              bs.entries(new Path(f).getParent.toUri.getPath)
            }
            (0 until bs.n).flatMap { b =>
              byBucket.getOrElse(b, Nil) match {
                case Nil => Seq(ParquetGroups.BucketedBin(
                  ParquetGroups.FileBin(Nil), b))
                case fs => fs.map { case (f, _) => ParquetGroups.BucketedBin(
                  withDv(ParquetGroups.FileBin(Seq(f))), b)
                }
              }
            }.toArray
          case None =>
            val target = options.getLong("targetBytesPerPartition", 128L << 20)
            SnapshotsDataSource.bin(files, target).map(withDv).toArray
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        ParquetGroups.GroupReaderFactory(
          new ParquetGroups.SerializableConf(hadoopConf), required,
          // one row-vs-columnar answer per scan: any deletion vector
          // anywhere in the version sends the whole scan down the
          // position-skipping row path, and a projected `_pos` (delta
          // DML row id — per-row, no vectorized slot) does the same
          vectorize = options.getBoolean("vectorizedReader", true) &&
            dvMap.isEmpty &&
            !required.fieldNames.contains(ParquetGroups.RowPosCol))
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SnapshotMicroBatchStream(SnapshotsDataSource.normalizePath(options),
      required, new ParquetGroups.SerializableConf(hadoopConf), options)
}
