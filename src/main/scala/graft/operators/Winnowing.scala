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

  /** Containment pairs `(a, b, shared, fpa, fpb, containment)` with
    * `a < b`: documents sharing ≥ 1 winnowing fingerprint, scored by
    * `shared / min(fpa, fpb)` — the asymmetric-overlap measure that
    * catches a short document EMBEDDED in a long one, which symmetric
    * Jaccard dilutes away. The winnowing guarantee makes this sound:
    * any shared substring of ≥ k + w − 1 characters contributes at
    * least one common fingerprint.
    *
    * `maxDf` drops fingerprints selected in more than that many
    * documents before pairing — 28-bit hashes of COMMON k-grams
    * ("the and…", site boilerplate) would otherwise each fan out df²
    * candidate pairs; capping df bounds the join's hot keys, exactly
    * the d11 `maxGramDf` hazard. Sizes `fpa`/`fpb` count the SAME
    * capped set, so containment stays a ratio over one universe
    * (a boilerplate-only document simply exits the query).
    *
    * Choosing `k`: winnowing selects MINIMUM hashes, so selections are
    * biased toward whatever grams are corpus-common — on repetitive
    * corpora a short `k` makes most selected fingerprints hot keys and
    * the df cap starts deciding results instead of guarding them
    * (measured at sf0.1: k=8 → sum(df²) 232M candidate rows, k=24 →
    * 454k). For containment detection prefer k large enough that a
    * k-gram is distinctive (16-32 chars); the detection floor is
    * shared runs of k + w − 1 characters.
    *
    * Plan shape: the fingerprint pass (one per-doc exchange), a
    * distinct + df aggregate on `fp`, then ONE fp equi-join whose key
    * cardinality is bounded by `maxDf` — corpus-linear candidates, no
    * cartesian, partitionable at 100 TB.
    */
  def containmentPairs(corpus: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, w: Int = 4, tau: Double = 0.5,
                       maxDf: Long = 1000L): DataFrame =
    containmentPairsWithRelease(corpus, idCol, textCol, k, w, tau, maxDf)._1

  /** As [[containmentPairs]], plus a release handle for the pinned
    * fingerprint cache (harnesses may instead sweep with
    * SparkHygiene.dropAllPersisted — the PageRank.run contract).
    */
  def containmentPairsWithRelease(corpus: DataFrame, idCol: String,
                                  textCol: String, k: Int = 8, w: Int = 4,
                                  tau: Double = 0.5, maxDf: Long = 1000L)
      : (DataFrame, () => Unit) = {
    val fps = fingerprints(corpus, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp")).distinct()
    // optimization r14: `kept` feeds three consumers (both shared-join
    // sides and the per-doc sizes) over the winnowing pipeline —
    // per-character rolling hashes, the df window, a distinct — and the
    // executed plan showed the pipeline largely recomputed per consumer
    // (20 exchanges, 3 reused). Materialize once, eagerly (concurrent
    // consumers would race a lazy cache into duplicate materialization).
    val kept = fps
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("__df") <= maxDf)
      .select(col("__id"), col("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kept.count()
    val sizes = kept.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val shared = kept.select(col("__id").as("a"), col("fp"))
      .join(kept.select(col("__id").as("b"), col("fp")), "fp")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    val out = shared
      .join(sizes.select(col("__id").as("a"), col("__n").as("fpa")), "a")
      .join(sizes.select(col("__id").as("b"), col("__n").as("fpb")), "b")
      .withColumn("containment",
        round(col("shared") * lit(1.0) / least(col("fpa"), col("fpb")), 6))
      .filter(col("containment") >= tau)
      .select(col("a"), col("b"), col("shared"), col("fpa"), col("fpb"),
        col("containment"))
    (out, () => { kept.unpersist(); () })
  }
}
