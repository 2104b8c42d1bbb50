package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.operators.Optimize
import graft.sources.Snapshots

/** OPTIMIZE ZORDER: the rewrite is logically invisible and versioned,
  * and — the point — footer stats prune BOTH cluster dimensions
  * afterwards, measured through the V2 connector's plan-time file-skip
  * counts (the two layers composing is itself under test).
  */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def skipCounts(df: DataFrame): (Int, Int) = {
    val desc = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.head
    ("files=(\\d+)".r.findFirstMatchIn(desc).get.group(1).toInt,
      "skipped=(\\d+)".r.findFirstMatchIn(desc).get.group(1).toInt)
  }

  test("z-order rewrite: both dimensions prune; content and history survive") {
    val t = SparkHygiene.scratchDir("opt_tbl")
    // 64×64 grid; v1 range-clustered on x ONLY — the 1-D layout whose
    // second access path is a full scan
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, x * 64L + y))).toDF("x", "y", "payload")
    Snapshots.commit(spark, t, grid.repartitionByRange(16, $"x"))

    def readV2(filter: org.apache.spark.sql.Column) =
      spark.read.format("graft_snapshots").option("path", t).load()
        .filter(filter)

    // before: x prunes (the cluster key), y cannot (every file spans y)
    val (k1, s1) = skipCounts(readV2($"x" >= 60L))
    assert(k1 + s1 == 16 && s1 >= 12, s"x-band pre-optimize: kept=$k1 skipped=$s1")
    val (k2, s2) = skipCounts(readV2($"y" >= 60L))
    assert(s2 == 0, s"y-band pre-optimize should skip nothing: kept=$k2 skipped=$s2")

    val report = Optimize.zorder(spark, t, "x", "y", targetBytes = 4L << 10)
    assert(report.version == 2 && report.outFiles >= 8, report.toString)

    // after: BOTH dimensions prune most files
    val (k3, s3) = skipCounts(readV2($"x" >= 60L))
    val (k4, s4) = skipCounts(readV2($"y" >= 60L))
    assert(k3 + s3 == report.outFiles && s3 * 2 >= report.outFiles,
      s"x-band post-optimize: kept=$k3 skipped=$s3 of ${report.outFiles}")
    assert(k4 + s4 == report.outFiles && s4 * 2 >= report.outFiles,
      s"y-band post-optimize: kept=$k4 skipped=$s4 of ${report.outFiles}")

    // the rewrite is logically invisible...
    assert(readV2($"y" >= 60L).count() == 64L * 4)
    assert(Snapshots.read(spark, t)
      .select(sum($"payload")).as[Long].head() ==
      grid.select(sum($"payload")).as[Long].head())
    // ...and the pre-optimize layout still time-travels
    val v1Files = Snapshots.manifestEntries(t, 1)
    assert(Snapshots.read(spark, t, Some(1)).count() == 4096)
    assert(Snapshots.manifestEntries(t, 2).forall(e => !v1Files.contains(e)))
  }

  test("out-of-domain cluster values fail loudly instead of mis-clustering") {
    val t = SparkHygiene.scratchDir("opt_bad")
    Snapshots.commit(spark, t, Seq((-1L, 2L, 0L)).toDF("x", "y", "payload"))
    val e = intercept[Exception] {
      Optimize.zorder(spark, t, "x", "y", targetBytes = 1L << 20)
    }
    assert(e.getMessage != null)
    // the failed rewrite must NOT have committed a new version
    assert(Snapshots.currentVersion(t) == 1)
  }
}
