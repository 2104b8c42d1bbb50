package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level (line-level) dedup statistics — the CCNet shape:
  * documents are cut into fixed-length token segments (lines, when the
  * corpus has them), segment document-frequency is counted corpus-wide,
  * and each document reports how much of it is boilerplate (segments
  * shared with at least `minDf - 1` other documents).
  *
  * Plan shape: two hash shuffles (segment df, doc regroup), no pairwise
  * join — corpus-linear at any scale. At 100 TB the exchange key would
  * be a 16-byte segment digest rather than the raw string (same plan);
  * the raw string here keeps the DuckDB oracle comparison digest-free.
  */
object SegmentDedup {

  /** One row per (doc, distinct segment): a segment repeated WITHIN a
    * document counts once (CCNet counts documents, not occurrences).
    * The final partial segment is kept as-is (shorter than `segLen`).
    */
  def segments(corpus: DataFrame, idCol: String, textCol: String,
               segLen: Int): DataFrame = {
    require(segLen > 0)
    val nSeg = greatest(
      ceil(size(col("__toks")) / lit(segLen.toDouble)).cast("int"), lit(1))
    corpus
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), explode(
        transform(sequence(lit(0), nSeg - 1),
          i => array_join(slice(col("__toks"), i * segLen + 1, lit(segLen)), " ")))
        .as("seg"))
      .distinct()
  }

  /** Per-document boilerplate statistics: (id, n_segments,
    * n_boilerplate, boilerplate_ratio), where a segment is boilerplate
    * when its corpus document-frequency is ≥ `minDf`.
    */
  def stats(corpus: DataFrame, idCol: String, textCol: String,
            segLen: Int = 10, minDf: Int = 2): DataFrame = {
    val docSeg = segments(corpus, idCol, textCol, segLen)
    val segDf = docSeg.groupBy(col("seg")).agg(count(lit(1)).as("df"))
    docSeg.join(segDf, "seg")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boilerplate"))
      .withColumn("boilerplate_ratio",
        round(col("n_boilerplate") / col("n_segments"), 6))
  }
}
