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

  /** One row per (doc, segment position): (id, i, seg) with `i` the
    * 0-based segment index. The final partial segment is kept as-is
    * (shorter than `segLen`).
    */
  def positionedSegments(corpus: DataFrame, idCol: String, textCol: String,
                         segLen: Int): DataFrame = {
    require(segLen > 0)
    val nSeg = greatest(
      ceil(size(col("__toks")) / lit(segLen.toDouble)).cast("int"), lit(1))
    corpus
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), nSeg - 1),
          i => array_join(slice(col("__toks"), i * segLen + 1, lit(segLen)), " "))))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "seg")
  }

  /** One row per (doc, distinct segment): a segment repeated WITHIN a
    * document counts once (CCNet counts documents, not occurrences).
    */
  def segments(corpus: DataFrame, idCol: String, textCol: String,
               segLen: Int): DataFrame =
    positionedSegments(corpus, idCol, textCol, segLen)
      .select(col(idCol), col("seg")).distinct()

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

  /** Boilerplate REMOVAL — the CCNet decision applied to the corpus
    * (d10 only reports the ratio; this emits the cleaned text): every
    * segment whose corpus document-frequency exceeds `maxDf` is dropped
    * from every document, and each document is reassembled from its kept
    * segments in original order. Documents whose every segment is
    * boilerplate survive with empty text (the caller decides whether an
    * emptied doc is dropped — that is a corpus policy, not a transform).
    *
    * Plan shape: three hash shuffles, all corpus-linear — segment df
    * (partial-aggregated map-side), the df join back onto positioned
    * segments, and the per-document regroup. Per-document state in the
    * regroup is bounded by document length (the kept-segment list), never
    * by corpus size. `digestKey = true` is the 100 TB plan: the df
    * aggregation and join exchange 16-byte md5 digests, so the wide
    * segment strings move only in the doc-keyed regroup they must reach
    * anyway.
    */
  def strip(corpus: DataFrame, idCol: String, textCol: String,
            segLen: Int = 10, maxDf: Int = 1,
            digestKey: Boolean = false): DataFrame = {
    val pseg = positionedSegments(corpus, idCol, textCol, segLen)
      .withColumn("__h", if (digestKey) md5(col("seg")) else col("seg"))
    val segDf = pseg.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("df"))
    val keep = col("df") <= maxDf
    pseg.join(segDf, "__h")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(keep, struct(col("i"), col("seg"))))),
            x => x("seg")),
          " ").as("cleaned"),
        count(when(keep, lit(1))).as("n_kept"),
        count(lit(1)).as("n_segments"))
  }

  /** WITHIN-document consecutive-repeat removal (t24): a run of
    * identical consecutive segments collapses to its first occurrence,
    * the document reassembled from the kept segments in order. Output:
    * (id, cleaned, n_kept).
    *
    * This is a strictly per-document function, so it is computed per
    * document (optimization r15, guide §2.4 — the winnowing-fusion
    * discipline): the segment array stays IN-ROW and consecutive
    * duplicates drop via an indexed `filter` lambda comparing each
    * element to its predecessor — no explode, no doc-keyed exchange, no
    * window sort, no regroup. The former dataflow (explode → lag window
    * → filter → collect_list regroup) computed the identical rows
    * through one full exchange + two sorts; RepeatStripSpec pins the
    * fused form against an inline replica of it. The `__segs` array is
    * referenced twice (filter input + element_at lookback), which keeps
    * CollapseProject from inlining the transform into the lambda — the
    * segments materialize once per row, lookback is O(1) per element.
    */
  def stripConsecutiveRepeats(corpus: DataFrame, idCol: String,
                              textCol: String, segLen: Int): DataFrame = {
    require(segLen > 0)
    val nSeg = greatest(
      ceil(size(col("__toks")) / lit(segLen.toDouble)).cast("int"), lit(1))
    corpus
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__segs", transform(sequence(lit(0), nSeg - 1),
        i => array_join(slice(col("__toks"), i * segLen + 1, lit(segLen)), " ")))
      .withColumn("__kept", filter(col("__segs"),
        // i is the 0-based element index; element_at is 1-based, so
        // element_at(__segs, i) IS the predecessor — guarded by when()
        // so index 0 is never evaluated (ANSI-safe)
        (s, i) => when(i === lit(0), lit(true))
          .otherwise(s =!= element_at(col("__segs"), i))))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("cleaned"),
        size(col("__kept")).cast("long").as("n_kept"))
  }
}
