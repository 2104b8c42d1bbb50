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
      .map { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
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
          FileStat(st.getPath.toString, st.getLen, rows, lo, hi)
        } finally reader.close()
      }
      .sortBy(_.lo)
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
}
