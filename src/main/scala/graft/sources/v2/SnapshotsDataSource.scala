package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
  * Executor-side row materialization goes through the public
  * parquet-hadoop record API ([[ParquetGroups]]) — correct for the
  * engine's full table surface (flat columns + embedding arrays),
  * traded against Spark's vectorized batch decode; interactive
  * whole-table batch scans should keep using [[Snapshots.read]], which
  * plans the native vectorized reader over the same manifest.
  */
class SnapshotsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft_snapshots"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val (dir, version) = SnapshotsDataSource.resolve(options)
    val files = SnapshotsDataSource.filesOf(
      spark.sparkContext.hadoopConfiguration,
      Snapshots.manifestEntries(dir, version))
    require(files.nonEmpty, s"snapshot table $dir v$version has no files")
    val schema = spark.read.parquet(files.head._1).schema
    SnapshotsDataSource.validate(schema)
    schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SnapshotTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object SnapshotsDataSource {

  /** (tableDir, resolved version) from read options. */
  private[v2] def resolve(options: CaseInsensitiveStringMap): (String, Int) = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft_snapshots requires a path"))
    val v = Option(options.get("versionAsOf")).map(_.toInt)
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
                            cols: Set[String]): Map[String, (Long, Long)] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      reader.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          if (cols.contains(name)) {
            val s = c.getStatistics
            if (s == null || s.isEmpty) acc(name) = (Long.MinValue, Long.MaxValue)
            else {
              val lo = s.genericGetMin.asInstanceOf[Number].longValue
              val hi = s.genericGetMax.asInstanceOf[Number].longValue
              val (plo, phi) = acc.getOrElse(name, (Long.MaxValue, Long.MinValue))
              acc(name) = (math.min(plo, lo), math.max(phi, hi))
            }
          }
        }
      }
      cols.iterator.map(c =>
        c -> acc.getOrElse(c, (Long.MinValue, Long.MaxValue))).toMap
    } finally reader.close()
  }

  /** Can a file with [lo, hi] per column possibly satisfy `f`? */
  private[v2] def mightMatch(stats: Map[String, (Long, Long)],
                             f: Filter): Boolean = f match {
    case EqualTo(c, v: Long) =>
      stats.get(c).forall { case (lo, hi) => lo <= v && v <= hi }
    case GreaterThan(c, v: Long) => stats.get(c).forall(_._2 > v)
    case GreaterThanOrEqual(c, v: Long) => stats.get(c).forall(_._2 >= v)
    case LessThan(c, v: Long) => stats.get(c).forall(_._1 < v)
    case LessThanOrEqual(c, v: Long) => stats.get(c).forall(_._1 <= v)
    case _ => true
  }

  /** The filters the file-skip layer understands: single long-column
    * comparisons against a long literal. */
  private[v2] def skippable(schema: StructType, f: Filter): Boolean = {
    def longCol(c: String) =
      schema.fields.exists(x => x.name == c && x.dataType == LongType)
    f match {
      case EqualTo(c, _: Long) => longCol(c)
      case GreaterThan(c, _: Long) => longCol(c)
      case GreaterThanOrEqual(c, _: Long) => longCol(c)
      case LessThan(c, _: Long) => longCol(c)
      case LessThanOrEqual(c, _: Long) => longCol(c)
      case _ => false
    }
  }
}

/** The V2 table: batch reads (with time travel + file skipping) and
  * micro-batch streaming of the commit feed.
  */
class SnapshotTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"graft_snapshots(${options.get("path")})"

  override def schema(): StructType = schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(schema,
      // merge table-level options with per-read ones (per-read wins)
      new CaseInsensitiveStringMap({
        val m = new util.HashMap[String, String](options)
        m.putAll(o)
        m
      }))
}

class SnapshotScanBuilder(fullSchema: StructType,
                          options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var skipFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the table's declared types; Spark hands back a subset
    required = StructType(
      requiredSchema.fields.flatMap(f => fullSchema.fields.find(_.name == f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skipFilters = filters.filter(SnapshotsDataSource.skippable(fullSchema, _))
    // file-level stats are a superset bound, never an exact evaluation:
    // hand every filter back so Spark re-applies them on the rows
    filters
  }

  override def pushedFilters(): Array[Filter] = skipFilters

  override def build(): Scan = new SnapshotScan(fullSchema, required,
    skipFilters, options)
}

class SnapshotScan(fullSchema: StructType, required: StructType,
                   skipFilters: Array[Filter],
                   options: CaseInsensitiveStringMap) extends Scan {

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
      val kept = all.filter { case (f, _) =>
        val st = SnapshotsDataSource.longStats(hadoopConf, f, cols)
        skipFilters.forall(SnapshotsDataSource.mightMatch(st, _))
      }
      (kept, all.size - kept.size)
    }
  }

  override def readSchema(): StructType = required

  override def description(): String = {
    val (kept, skipped) = planned
    s"graft_snapshots $tableDir v$version files=${kept.size} " +
      s"skipped=$skipped pushed=[${skipFilters.mkString(", ")}]"
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val target = options.getLong("targetBytesPerPartition", 128L << 20)
      SnapshotsDataSource.bin(planned._1, target).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      ParquetGroups.GroupReaderFactory(
        new ParquetGroups.SerializableConf(hadoopConf), required)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SnapshotMicroBatchStream(options.get("path"), required,
      new ParquetGroups.SerializableConf(hadoopConf), options)
}
