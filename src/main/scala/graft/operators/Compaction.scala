package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file COMPACTION — the lake-maintenance rewrite (Delta
  * OPTIMIZE / Iceberg rewrite_data_files): fold a directory of many
  * small parquet files into ≈`targetBytes` files, range-clustered on a
  * sort key so the rewrite also buys data skipping (each output file
  * owns a disjoint key range, so min/max footer stats prune point and
  * range reads — the m6 Z-order discipline in one dimension).
  *
  * The file count is planned DETERMINISTICALLY from the input
  * listing's byte total (never from row counts — at 100 TB row counts
  * need a scan, byte totals are free from the namenode listing), and
  * the rewrite itself is one `repartitionByRange` pass: a range
  * exchange with sampled bounds, then one writer per output file. Cost
  * is one read + one shuffle of the data being compacted — the floor
  * for any rewrite — and the operation parallelizes per partition
  * directory in a partitioned table.
  *
  * Exercised under the oracle gate by `p20_compaction` (oracle: the
  * logical content is unchanged) and by CompactionSpec (file count,
  * disjoint per-file key ranges).
  */
object Compaction {

  case class Report(inFiles: Int, inBytes: Long, outFiles: Int)

  /** Compact `inDir` (a parquet directory) into `outDir`.
    *
    * @param sortCol     key to range-cluster output files on
    * @param targetBytes approximate output file size; the output file
    *                    count is ceil(inputDataBytes / targetBytes)
    *                    (parquet re-encoding changes exact sizes — the
    *                    count, not the byte size, is the contract)
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              sortCol: String, targetBytes: Long): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(new Path(inDir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val inBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1L, (inBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartitionByRange(n, col(sortCol))
      .write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new Path(outDir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    Report(dataFiles.length, inBytes, outFiles)
  }
}
