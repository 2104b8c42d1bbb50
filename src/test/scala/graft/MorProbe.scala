package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Merge-on-read vs copy-on-write DELETE cost probe (round 14):
  * quantifies the DV trade on the sf0.1 documents corpus — commit
  * latency of a narrow 5-key erase, bytes moved, the per-read tax a
  * DV'd version pays (row-path scan vs vectorized), and the
  * reconciliation cost (CALL system.compact). Run:
  * `sbt -batch "Test/runMain graft.MorProbe /root/testdata/sf0.1"`.
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def mk(tag: String): String = {
      val t = SparkHygiene.scratchDir(s"morprobe_$tag")
      Snapshots.commit(spark, t, Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(8, col("doc_id")))
      t
    }
    def tableBytes(t: String): Long =
      Snapshots.manifestEntries(t, Snapshots.currentVersion(t)).map { e =>
        val f = new java.io.File(e)
        if (f.isDirectory)
          f.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(_.length).sum
        else f.length
      }.sum
    val keys = Seq(7L, 1007L, 2007L, 3007L, 4007L)

    // warm the JIT/scan path once
    val w = mk("warm"); spark.read.parquet(
      Snapshots.manifestEntries(w, 1): _*).count()

    val tMor = mk("mor")
    val bytesBefore = tableBytes(tMor)
    val (_, morSec) = timed(
      graft.operators.DeleteRows.deleteKeysWithVectors(spark, tMor,
        "doc_id", keys))
    val morMoved = tableBytes(tMor) - bytesBefore

    val tCow = mk("cow")
    val (rCow, cowSec) = timed(
      graft.operators.DeleteRows.deleteKeys(spark, tCow, "doc_id", keys))

    // read tax: DV'd version (row path) vs CoW version (vectorized)
    def readSec(t: String): Double = {
      val (_, s) = timed(spark.read.format("graft_snapshots")
        .option("path", t).load().agg(count(lit(1))).collect())
      s
    }
    val dvRead1 = readSec(tMor); val dvRead2 = readSec(tMor)
    val cowRead1 = readSec(tCow); val cowRead2 = readSec(tCow)

    // reconciliation: compact the DV'd table back to vectorized
    val (_, compactSec) = timed(graft.operators.Optimize.compactTable(
      spark, tMor, "doc_id", 32L << 20))
    val recRead = readSec(tMor)

    println(f"[morprobe] corpus_bytes=$bytesBefore%d keys=${keys.size}%d")
    println(f"[morprobe] mor_delete_sec=$morSec%.2f bytes_moved=$morMoved%d")
    println(f"[morprobe] cow_delete_sec=$cowSec%.2f files_rewritten=" +
      s"${rCow.filesRewritten} of ${rCow.filesRewritten + rCow.filesKept}")
    println(f"[morprobe] dv_read_sec=$dvRead1%.2f/$dvRead2%.2f " +
      f"cow_read_sec=$cowRead1%.2f/$cowRead2%.2f")
    println(f"[morprobe] compact_sec=$compactSec%.2f " +
      f"reconciled_read_sec=$recRead%.2f")
  }
}
