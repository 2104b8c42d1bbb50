package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level MANIFEST over a parquet directory — the metadata layer a
  * table format (Delta log / Iceberg manifest) adds on top of raw
  * files: per-file row counts, byte sizes and column min/max, read
  * from parquet FOOTERS only (never the data pages), and a pruned-read
  * planner that turns a key range into the exact file list to scan.
  *
  * Why this matters at 100 TB: Spark's own row-group pruning
  * (PushedFilters) runs AFTER a task has been scheduled per file —
  * every file still costs a task, an open, and a footer fetch on the
  * executor. Manifest pruning removes non-matching files from the scan
  * PLAN, so a point read against a range-clustered table (the
  * operators/Compaction layout) schedules O(1) tasks instead of
  * O(files). The footer pass is driver-side and bounded by file count
  * — the same listing the scan needs anyway; a production deployment
  * persists `stats` once per write and reads it back, paying the
  * footer sweep never.
  *
  * Exercised by ManifestSpec: stats agree with a full scan, and a
  * pruned point read plans exactly the one file that can match.
  */
object Manifest {

  case class FileStat(path: String, bytes: Long, rows: Long,
                      lo: Long, hi: Long)

  /** Footer-only per-file stats for a LONG column `keyCol`. */
  def stats(spark: SparkSession, dir: String, keyCol: String): Seq[FileStat] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .toSeq
      .map(st => fileStat(conf, st.getPath, st.getLen, keyCol))
      .sortBy(_.lo)
  }

  /** Footer-only stats for ONE parquet file (the unit [[stats]] maps
    * over; public for consumers that resolve their file lists from a
    * snapshot manifest instead of a directory listing — DeleteRows). */
  def fileStat(conf: org.apache.hadoop.conf.Configuration, path: Path,
               len: Long, keyCol: String): FileStat = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      var rows = 0L
      var lo = Long.MaxValue
      var hi = Long.MinValue
      blocks.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala
          .find(_.getPath.toDotString == keyCol)
          .foreach { c =>
            val s = c.getStatistics
            if (s != null && !s.isEmpty) {
              lo = math.min(lo, s.genericGetMin.asInstanceOf[Number].longValue)
              hi = math.max(hi, s.genericGetMax.asInstanceOf[Number].longValue)
            }
          }
      }
      FileStat(path.toString, len, rows, lo, hi)
    } finally reader.close()
  }

  /** Read only the files whose [lo, hi] stats can intersect
    * [keyLo, keyHi]; the residual filter still applies (stats are a
    * superset bound, exactly like a table format's pruning).
    */
  def prunedRead(spark: SparkSession, dir: String, keyCol: String,
                 keyLo: Long, keyHi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val matching = stats(spark, dir, keyCol)
      .filter(f => f.lo <= keyHi && f.hi >= keyLo)
      .map(_.path)
    val base =
      if (matching.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(matching: _*)
    base.filter(col(keyCol) >= keyLo && col(keyCol) <= keyHi)
  }

  // -------------------------------------------------------------------
  // Bloom-filter manifest — the data-skipping layer for HASH-distributed
  // layouts, where min/max is useless (every file spans ~the full key
  // range) but membership still prunes: point lookups against an
  // ingest-ordered or hash-bucketed 100 TB table are the canonical case
  // (Delta's BLOOMFILTER index / Iceberg puffin blobs play this role).
  // The filter build is fully DISTRIBUTED — one scan computing k bit
  // positions per row, one (file, word) OR-aggregate — and only the
  // finished bitsets (files × bits/8 bytes, manifest-sized) reach the
  // driver, the same bounded-metadata discipline as `stats`. A
  // production deployment persists the bitsets next to the table and
  // pays the build once per write.
  // -------------------------------------------------------------------

  /** Per-file Bloom bitset over `keyCol` (long): `bits` must be a power
    * of two; `hashes` independent probe positions per key come from
    * xxhash64(key, seed) — the SAME function the probe side uses, so
    * false negatives are impossible by construction.
    */
  case class BloomStat(path: String, words: Array[Long]) {
    def mightContain(positions: Seq[Int]): Boolean =
      positions.forall(p => (words(p >>> 6) & (1L << (p & 63))) != 0)
  }

  def bloomStats(spark: SparkSession, dir: String, keyCol: String,
                 bits: Int = 1 << 15, hashes: Int = 5): Seq[BloomStat] =
    bloomStatsOf(spark.read.parquet(dir), keyCol, bits, hashes)

  /** [[bloomStats]] over an explicit file list — for consumers whose
    * files come from a snapshot manifest rather than one directory
    * ([[graft.operators.DeleteRows.deleteKeys]]).
    */
  def bloomStatsForPaths(spark: SparkSession, paths: Seq[String],
                         keyCol: String, bits: Int = 1 << 15,
                         hashes: Int = 5): Seq[BloomStat] =
    bloomStatsOf(spark.read.parquet(paths: _*), keyCol, bits, hashes)

  private def bloomStatsOf(df: DataFrame, keyCol: String,
                           bits: Int, hashes: Int): Seq[BloomStat] = {
    require(bits > 0 && (bits & (bits - 1)) == 0, s"bits must be a power of two: $bits")
    import org.apache.spark.sql.functions._
    val nWords = bits >>> 6
    val perFileWords = df
      .select(input_file_name().as("f"), col(keyCol).cast("long").as("k"))
      .select(col("f"), explode(array(
        (0 until hashes).map(i =>
          pmod(xxhash64(col("k"), lit(i)), lit(bits)).cast("int")): _*))
        .as("pos"))
      .select(col("f"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, pos % 64)").as("mask"))
      .groupBy(col("f"), col("word"))
      .agg(bit_or(col("mask")).as("m"))
      .collect()
    perFileWords.groupBy(_.getString(0)).map { case (f, rows) =>
      val words = new Array[Long](nWords)
      rows.foreach(r => words(r.getInt(1)) |= r.getLong(2))
      BloomStat(f, words)
    }.toSeq.sortBy(_.path)
  }

  /** Persist per-file Bloom filters as a SIDECAR next to the data —
    * the "pay the build once per write" half of the p22 story, made
    * literal (the same move the d18 epoch index makes for its df
    * table): one parquet file under `dir/_bloom_<keyCol>` holding
    * `(path, words)` rows. Underscore-prefixed, so Spark's own data
    * listing ignores it. Re-running after new files appear rebuilds
    * the whole sidecar (blooms don't merge incrementally here; the
    * build is one scan of the key column).
    */
  def persistBlooms(spark: SparkSession, dir: String, keyCol: String,
                    bits: Int = 1 << 15, hashes: Int = 5): Unit = {
    import spark.implicits._
    bloomStats(spark, dir, keyCol, bits, hashes)
      .map(b => (b.path, b.words.toSeq, bits, hashes))
      .toDF("path", "words", "bits", "hashes")
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecarPath(dir, keyCol))
  }

  private def sidecarPath(dir: String, keyCol: String) =
    s"$dir/_bloom_$keyCol"

  /** Read a persisted bloom sidecar back. None when absent OR when its
    * recorded (bits, hashes) disagree with the requested geometry — a
    * mismatched filter would silently produce false NEGATIVES, so it
    * must read as "no sidecar", never as a wrong answer.
    */
  def readBlooms(spark: SparkSession, dir: String, keyCol: String,
                 bits: Int = 1 << 15, hashes: Int = 5)
      : Option[Seq[BloomStat]] = {
    val p = new Path(sidecarPath(dir, keyCol))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    import spark.implicits._
    val rows = spark.read.parquet(p.toString)
      .as[(String, Seq[Long], Int, Int)].collect().toSeq
    if (rows.exists(r => r._3 != bits || r._4 != hashes)) return None
    Some(rows.map { case (path, words, _, _) => BloomStat(path, words.toArray) }
      .sortBy(_.path))
  }

  /** The probe side's bit positions for `keys`, computed THROUGH Spark's
    * own xxhash64 (a one-partition job over the tiny key list) so build
    * and probe can never disagree on the hash.
    */
  def bloomPositions(spark: SparkSession, keys: Seq[Long],
                     bits: Int, hashes: Int): Map[Long, Seq[Int]] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    keys.toDF("k").repartition(1)
      .select(col("k"), array((0 until hashes).map(i =>
        pmod(xxhash64(col("k"), lit(i)), lit(bits)).cast("int")): _*).as("pos"))
      .as[(Long, Seq[Int])].collect().toMap
  }

  /** Point-set read: scan only files whose Bloom filter might contain AT
    * LEAST ONE probe key, then apply the exact residual filter. With a
    * hash-distributed layout this plans ~(distinct home files of the
    * keys) instead of all files; false positives only ever ADD files,
    * never rows (the residual filter is exact).
    */
  def bloomPrunedRead(spark: SparkSession, dir: String, keyCol: String,
                      keys: Seq[Long], bits: Int = 1 << 15,
                      hashes: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.col
    val filters = bloomStats(spark, dir, keyCol, bits, hashes)
    val pos = bloomPositions(spark, keys, bits, hashes)
    val matching = filters
      .filter(f => keys.exists(k => f.mightContain(pos(k))))
      .map(_.path)
    val base =
      if (matching.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(matching: _*)
    base.filter(col(keyCol).isin(keys: _*))
  }
}
