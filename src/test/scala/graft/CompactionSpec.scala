package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

class CompactionSpec extends SparkSpec {

  test("compaction honors the byte budget and range-clusters files on " +
    "disjoint key ranges") {
    val in = SparkHygiene.scratchDir("cmp_in")
    val out = SparkHygiene.scratchDir("cmp_out")
    val src = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"), col("lang"))
    src.repartition(32).write.mode("overwrite").parquet(in)

    // small budget → several output files, so disjointness is non-vacuous
    val rep = Compaction.compact(spark, in, out, "doc_id", targetBytes = 64L << 10)
    assert(rep.inFiles == 32)
    val expected = ((rep.inBytes + (64L << 10) - 1) / (64L << 10)).toInt
    assert(rep.outFiles <= expected && rep.outFiles > 1,
      s"planned $expected files from ${rep.inBytes} bytes, wrote ${rep.outFiles}")

    // logical identity
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    assert(back.select(sum(col("doc_id"))).head.getLong(0) ==
      src.select(sum(col("doc_id"))).head.getLong(0))

    // each output file owns a disjoint doc_id range (footer-stat skipping)
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(ranges.length == rep.outFiles)
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          s"file ranges overlap: $a vs $b")
      case _ => ()
    }
  }

  test("a single file under budget compacts to one file") {
    val in = SparkHygiene.scratchDir("cmp1_in")
    val out = SparkHygiene.scratchDir("cmp1_out")
    Tables.region(spark, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val rep = Compaction.compact(spark, in, out, "r_regionkey",
      targetBytes = 128L << 20)
    assert(rep.outFiles == 1)
  }
}
