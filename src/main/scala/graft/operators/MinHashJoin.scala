package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** MinHash + LSH banding near-duplicate candidate join — the library
  * form of the d3 catalog query (classic Broder MinHash over word
  * shingles, banded so candidates come from an equi-join and never an
  * all-pairs scan).
  *
  * Signatures are ONE native-expression pass per document
  * ([[graft.functions.MinHashShingles]] — shingling fused in, no
  * explode, no per-seed min-aggregation shuffle); each signature splits
  * into `bands` groups of `hashes / bands` rows, and any shared
  * (band index, band hash) bucket yields a candidate pair. Probability
  * a pair with Jaccard j surfaces: 1 − (1 − j^(hashes/bands))^bands —
  * tune (hashes, bands) for the target similarity threshold.
  *
  * Output is CANDIDATES (a, b) with a < b — callers verify with the
  * exact measure of their choice (e.g. [[JaccardJoin]] semantics or a
  * direct shingle intersect) when false positives matter.
  */
object MinHashJoin {

  def selfPairs(corpus: DataFrame, idCol: String, textCol: String,
                shingleLen: Int = 3, hashes: Int = 12, bands: Int = 4): DataFrame = {
    require(bands > 0 && hashes % bands == 0,
      s"hashes ($hashes) must split evenly into bands ($bands)")
    val rows = hashes / bands
    val sigs = corpus
      .withColumn("__toks", TextFns.repetitionTokens(col(textCol)))
      .select(col(idCol).as("__id"),
        TextFns.minHashShingles(col("__toks"), shingleLen, hashes).as("mhs"))
    // every band hash rides along with each exploded band row (as FLAT
    // columns — an array<string> payload here measured 1.8× the whole
    // query: per-row UnsafeArrayData build/copy through project+join,
    // while flat columns are plain codegen field refs) so the post-join
    // dedup is a map-side predicate, not an exchange
    val bandCols = (0 until bands).map(bi =>
      md5(concat_ws(",",
        (0 until rows).map(r => element_at(col("mhs"), bi * rows + r + 1)): _*)).as(s"__b$bi"))
    val withBands = sigs.select(col("__id") +: bandCols: _*)
    val bandedCols: Seq[org.apache.spark.sql.Column] =
      col("__id") +: (0 until bands).map(bi => col(s"__b$bi")) :+
        posexplode(array((0 until bands).map(bi => col(s"__b$bi")): _*))
          .as(Seq("__bk", "__bh"))
    val banded = withBands.select(bandedCols: _*)
    // A near-dup pair agrees in SEVERAL bands and would surface once per
    // agreeing band; rather than a distinct() shuffle over the multiplied
    // candidates (VERDICT r5 — the one avoidable exchange in this plan),
    // keep a candidate only in the FIRST band where the band hashes agree
    // (same trick as SimHashJoin.banded): each pair leaves the join
    // exactly once and no dedup exchange exists at all.
    val firstAgreeingBand = (0 until bands).foldRight(lit(-1)) { (k, rest) =>
      when(col(s"x.__b$k") === col(s"y.__b$k"), lit(k)).otherwise(rest)
    }
    banded.as("x").join(banded.as("y"),
        col("x.__bk") === col("y.__bk") && col("x.__bh") === col("y.__bh") &&
          col("x.__id") < col("y.__id"))
      .filter(col("x.__bk") === firstAgreeingBand)
      .select(col("x.__id").as("a"), col("y.__id").as("b"))
  }

  /** [[selfPairs]] candidates scored with the MinHash Jaccard ESTIMATE
    * (Broder's original use of the sketch): est = (# agreeing signature
    * positions) / hashes, an unbiased estimator of the true Jaccard with
    * standard error 1/√hashes. This is the 100 TB scoring path — exact
    * verification intersects shingle sets (rescans text for every
    * candidate), the estimate touches only the fixed-width signatures.
    * Signatures are recomputed for the estimate joins rather than ridden
    * through the band join as an array payload (PERF lesson #10: array
    * ride-alongs measured 1.8× on this exact join; one extra map pass
    * over the corpus is the cheaper side of that trade). The agreement
    * count is an exact integer and `hashes` a constant, so the rounded
    * ratio is engine-portable (single exactly-rounded division).
    */
  def selfPairsEstimated(corpus: DataFrame, idCol: String, textCol: String,
                         shingleLen: Int = 3, hashes: Int = 12,
                         bands: Int = 4): DataFrame = {
    val pairs = selfPairs(corpus, idCol, textCol, shingleLen, hashes, bands)
    val sigs = corpus
      .withColumn("__toks", TextFns.repetitionTokens(col(textCol)))
      .select(col(idCol).as("__sid"),
        TextFns.minHashShingles(col("__toks"), shingleLen, hashes).as("__mhs"))
    val agree = aggregate(
      zip_with(col("__ma"), col("__mb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    pairs
      .join(sigs.select(col("__sid").as("a"), col("__mhs").as("__ma")), "a")
      .join(sigs.select(col("__sid").as("b"), col("__mhs").as("__mb")), "b")
      .select(col("a"), col("b"),
        round(agree.cast("double") / lit(hashes.toDouble), 4).as("est_jaccard"))
  }
}
