package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
  * operator: the sketch is a (row, cell, cnt) table of d·256 rows, the
  * update rule is a groupBy, and the point query is a broadcast probe.
  *
  * Why relational instead of a UDAF buffer: the d×w counter matrix IS
  * a tiny keyed aggregate, and expressing it as one lets Catalyst do
  * everything — the corpus NEVER shuffles (partial aggregation
  * collapses each map partition to ≤ d·256 cells before the exchange,
  * so the shuffle carries kilobytes regardless of input size), merge
  * is the aggregate's own `sum` (commutative, associative), and the
  * whole build stays inside whole-stage codegen. That is the 100 TB
  * frequency-estimation story: heavy-hitter screening over any volume
  * at the cost of one scan plus a constant-size exchange.
  *
  * Portability: cells come from the md5-hex idiom shared with the
  * KMV/MinHash family (`conv(substr(md5('cms<j>:'||key),1,2),16,10)` —
  * the first two hex digits, an exact 8-bit value), so an external
  * oracle replays the sketch AND the estimates bit-for-bit. Width is
  * fixed at 256 by the two-digit extraction; widening means taking
  * more digits (the error bound is ε = e/w with probability 1−e^−d).
  *
  * Estimates are upper bounds: est(k) = min_j cells[j][h_j(k)] ≥
  * true_count(k) always, with overestimate only from cell collisions.
  */
object CmsSketch {

  /** 8-bit cell index of `key` under hash row `j`. */
  def cellOf(key: Column, j: Int): Column =
    conv(substring(md5(concat(lit(s"cms$j:"), key)), 1, 2), 16, 10)
      .cast("int")

  /** Build the sketch: one row per non-empty cell, ≤ d·256 rows. */
  def build(items: DataFrame, keyCol: String, d: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"need 1 <= d <= 16, got $d")
    items
      .select(posexplode(array((0 until d).map(j =>
        cellOf(col(keyCol), j)): _*)).as(Seq("row", "cell")))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for `probes` (distinct keys in `keyCol`):
    * min over the d rows, 0 for never-inserted keys. The sketch side
    * broadcasts (≤ d·256 rows), so probing costs no probe-side
    * shuffle beyond the final per-key min.
    */
  def estimate(probes: DataFrame, cells: DataFrame, keyCol: String,
               d: Int): DataFrame = {
    val probeCells = probes
      .select(col(keyCol),
        posexplode(array((0 until d).map(j =>
          cellOf(col(keyCol), j)): _*)).as(Seq("row", "cell")))
    probeCells
      .join(broadcast(cells), Seq("row", "cell"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }
}
