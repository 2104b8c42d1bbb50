package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SegmentDedup

/** Parity pin for the fused consecutive-repeat strip (optimization r15):
  * [[SegmentDedup.stripConsecutiveRepeats]] must emit EXACTLY the rows of
  * the former dataflow (positioned-segment explode → doc-keyed lag window
  * → filter → collect_list regroup), replicated inline here — the same
  * discipline WinnowingSpec applies to the fused winnowing expression.
  * The t24 oracle replays the old dataflow in SQL, so bit-parity here is
  * what keeps the query's hash stable.
  */
class RepeatStripSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r15 dataflow, verbatim. */
  private def dataflowReplica(corpus: DataFrame, segLen: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    SegmentDedup.positionedSegments(corpus, "doc_id", "text", segLen)
      .withColumn("__prev", lag(col("seg"), 1).over(w))
      .filter(col("__prev").isNull || col("seg") =!= col("__prev"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("i"), col("seg")))),
            x => x("seg")), " ").as("cleaned"),
        count(lit(1)).as("n_kept"))
  }

  private def check(corpus: DataFrame, segLen: Int): Unit = {
    val fused = SegmentDedup
      .stripConsecutiveRepeats(corpus, "doc_id", "text", segLen)
      .orderBy(col("doc_id"))
    val replica = dataflowReplica(corpus, segLen).orderBy(col("doc_id"))
    assert(fused.schema.map(f => (f.name, f.dataType)) ==
      replica.schema.map(f => (f.name, f.dataType)))
    val f = fused.collect().toSeq
    val r = replica.collect().toSeq
    assert(f == r, s"fused=$f\nreplica=$r")
  }

  test("fused strip ≡ explode+lag dataflow on planted repeats") {
    val corpus = Seq(
      // 3× repeated 5-token run at the front (the t24 plant shape)
      (1L, "rp1 rp2 rp3 rp4 rp5 rp1 rp2 rp3 rp4 rp5 rp1 rp2 rp3 rp4 rp5 tail one two"),
      // repeats mid-document, aligned to the segment grid
      (2L, "a b c d e x x x x x x x x x x f g h"),
      // no repeats at all
      (3L, "one two three four five six seven eight nine ten eleven"),
      // shorter than one segment
      (4L, "tiny doc"),
      // single token and empty-ish text
      (5L, "x"),
      (6L, " "),
      // every segment identical (collapses to one)
      (7L, "z z z z z z z z z z z z z z z")
    ).toDF("doc_id", "text")
    check(corpus, segLen = 5)
    check(corpus, segLen = 3)
    check(corpus, segLen = 1)
  }

  test("fused strip ≡ dataflow on the real corpus slice with the t24 plant") {
    val rp = "rp1 rp2 rp3 rp4 rp5"
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit(s"$rp $rp $rp "), col("text")))
          .otherwise(col("text")).as("text"))
    check(corpus, segLen = 5)
  }
}
