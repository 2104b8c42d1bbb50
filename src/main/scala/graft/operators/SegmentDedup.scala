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
  * join — corpus-linear at any scale. At 100 TB pass `digestKey = true`:
  * the exchange key becomes the 16-byte md5 of the segment rather than
  * the raw string (same plan, far smaller exchange).
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
    *
    * `digestKey = true` is the 100 TB plan (SURVEY note above): both
    * shuffles exchange 16-byte md5 digests instead of raw segment
    * strings — identical results (collision probability negligible at
    * any corpus size), exchange payload shrunk by ~an order of
    * magnitude on prose segments.
    */
  def stats(corpus: DataFrame, idCol: String, textCol: String,
            segLen: Int = 10, minDf: Int = 2,
            digestKey: Boolean = false): DataFrame = {
    val raw = segments(corpus, idCol, textCol, segLen)
    val docSeg =
      if (digestKey) raw.select(col(idCol), md5(col("seg")).as("seg")) else raw
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
