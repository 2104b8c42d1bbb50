package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein ≤ k) similarity self-join via segment
  * filtering — the PassJoin scheme (Li, Deng, Feng: ICDE 2011 /
  * "PASS-JOIN: a partition-based method for similarity joins"): the
  * string-typo complement of the token-set d2 (Jaccard/PPJoin) and
  * bit-pattern d4/d9 (SimHash) dedup families, for short normalized
  * keys (titles, names, URLs) where edits, not token swaps, are the
  * corruption model.
  *
  * Lemma (pigeonhole with shift windows): partition s, |s| = Ls, into
  * k+1 contiguous segments (even split, longer segments last). If
  * ED(s, t) ≤ k, then t contains at least one segment seg_j of s as an
  * EXACT substring starting within [start_j − k, start_j + k]. So:
  *  - index side: each string emits its k+1 (Ls, j, segment) rows;
  *  - probe side: each string t emits, for every candidate partner
  *    length Ls ∈ [|t| − k, |t| + k] and segment slot j, the ≤ 2k+1
  *    substrings of t with the slot's exact length inside the shifted
  *    window — (2k+1)·(k+1)·(2k+1) bounded rows per string (k = 2: ≤ 75).
  *
  * Candidates join on the (Ls, j, segment-string) equi-key — a
  * partitionable hash join, never an all-pairs scan; a segment shared
  * by m strings contributes m·(probe hits) join rows, and the verify is
  * one `levenshtein` call per DISTINCT candidate pair. Lossless: the
  * lemma guarantees every true pair produces at least one candidate in
  * each direction; the oracle is the QUADRATIC ground truth (length
  * prefilter + levenshtein on all pairs), so the gate checks the lemma,
  * not a replay of the same plan.
  */
object EditDistanceJoin {

  /** All unordered pairs (a < b) with levenshtein ≤ k, plus the exact
    * distance. Strings shorter than k+1 chars have EMPTY even-partition
    * segments, and the pigeonhole witness can be exactly an empty one —
    * so zero-length segments are kept as legitimate `(len, slot, "")`
    * keys (the probe side emits matching zero-length window substrings).
    * Everything stays one equi-join; the empty-key cost is confined to
    * the short set (index strings of length ≤ k, probe strings ≤ 2k).
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val kp1 = k + 1

    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

    // even-partition scheme for a length: seg j (0-based) has length
    // base (+1 for the last `rem` slots) and start j·base + overflow
    def segLen(lenC: Column, j: Column): Column =
      floor(lenC / kp1).cast("int") +
        when(j >= lit(kp1) - pmod(lenC, lit(kp1)), 1).otherwise(0)
    def segStart(lenC: Column, j: Column): Column =
      (j * floor(lenC / kp1).cast("int") +
        greatest(lit(0), j - (lit(kp1) - pmod(lenC, lit(kp1))))).cast("int")

    val segs = base
      .withColumn("__j", explode(sequence(lit(0), lit(k))))
      .withColumn("__slen", segLen(col("__len"), col("__j")))
      .withColumn("__sstart", segStart(col("__len"), col("__j")))
      .select(col("__id").as("__a"), col("__s").as("__sa"),
        col("__len").as("__la"), col("__j"),
        col("__s").substr(col("__sstart") + 1, col("__slen")).as("__seg"))

    val probes = base
      .withColumn("__ls",
        explode(sequence(greatest(col("__len") - k, lit(0)), col("__len") + k)))
      .withColumn("__j", explode(sequence(lit(0), lit(k))))
      .withColumn("__slen", segLen(col("__ls"), col("__j")))
      .withColumn("__sstart", segStart(col("__ls"), col("__j")))
      .withColumn("__plo", greatest(lit(0), col("__sstart") - k))
      .withColumn("__phi", least(col("__len") - col("__slen"), col("__sstart") + k))
      .filter(col("__plo") <= col("__phi")) // sequence() would descend otherwise
      .withColumn("__p", explode(sequence(col("__plo"), col("__phi"))))
      .select(col("__id").as("__b"), col("__s").as("__sb"),
        col("__ls").as("__la"), col("__j"),
        col("__s").substr(col("__p") + 1, col("__slen")).as("__seg"))

    segs.join(probes, Seq("__la", "__j", "__seg"))
      .filter(col("__a") =!= col("__b"))
      .select(
        least(col("__a"), col("__b")).as("a"),
        greatest(col("__a"), col("__b")).as("b"),
        levenshtein(col("__sa"), col("__sb")).as("dist"))
      .filter(col("dist") <= k)
      .distinct()
  }
}
