package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
  * the MOSS fingerprint). Fills the reference pipeline's
  * document-fingerprinting slot (cf. news-clustering's per-article
  * dedup identity keys) with the LOCAL fingerprint a training-data
  * pipeline needs for containment/overlap detection, not just whole-doc
  * identity.
  *
  * Semantics: normalize (lower, collapse whitespace), hash every
  * character k-gram, slide a window of `w` consecutive k-gram hashes,
  * and in each window select the minimum hash — ties broken by the
  * RIGHTMOST position, per the paper. The selected (position, hash)
  * pairs are the fingerprint. Guarantees: every `w` consecutive k-grams
  * contribute at least one fingerprint (so any shared substring of
  * length ≥ k + w − 1 is detected), and expected density is 2/(w+1).
  *
  * Portability: the k-gram hash is the first 7 hex digits of md5 — a
  * 28-bit integer DuckDB reproduces digit-by-digit. Tie-break is encoded
  * arithmetically so both engines run the identical argmin: the window
  * minimum is taken over v = h·2^32 + (2^32−1−pos), which orders first
  * by hash, then by DESCENDING position — max v is h = 2^28−1,
  * pos = 1 → v < 2^60, no overflow.
  *
  * Plan shape: a narrow explode (one row per character position — all
  * codegen'd string ops), then ONE hash exchange on the id for the
  * per-document windows. The winnowing property that a selected
  * position, once superseded, never reappears (the superseding smaller
  * hash sits at a LATER position, so it leaves the window later) means
  * consecutive-duplicate selections form contiguous runs — dedup is a
  * `lag` over the SAME window partitioning, not a second exchange.
  * Corpus-linear at 100 TB; no cross-document shuffle at all.
  */
object Winnowing {

  /** Fingerprints of `textCol`: (idCol, pos, fp) — `pos` the 1-based
    * character position of the selected k-gram in the normalized text,
    * `fp` its 28-bit hash. Documents shorter than k + w − 1 normalized
    * chars have no full window and yield no rows (documented; both
    * engines agree).
    */
  def fingerprints(corpus: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0)
    val id = col(idCol)
    val grams = corpus
      .select(id, regexp_replace(lower(trim(col(textCol))), "\\s+", " ").as("__t"))
      .filter(length(col("__t")) >= k + w - 1)
      .select(id,
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("__p"),
        col("__t"))
      .select(id, col("__p").cast("long").as("__pos"),
        conv(substring(md5(col("__t").substr(col("__p"), lit(k))), 1, 7), 16, 10)
          .cast("long").as("__h"))
      .withColumn("__v",
        col("__h") * 4294967296L + (lit(4294967295L) - col("__pos")))
    val byDoc = Window.partitionBy(id).orderBy(col("__pos"))
    val sel = grams
      .withColumn("__vmin", min(col("__v")).over(byDoc.rowsBetween(-(w - 1), 0)))
      .filter(col("__pos") >= w)
      .select(id,
        col("__pos"),
        (lit(4294967295L) - pmod(col("__vmin"), lit(4294967296L))).as("pos"),
        shiftright(col("__vmin"), 32).as("fp"))
    sel
      .withColumn("__prev", lag(col("pos"), 1).over(byDoc))
      .filter(col("__prev").isNull || col("__prev") =!= col("pos"))
      .select(id, col("pos"), col("fp"))
  }
}
