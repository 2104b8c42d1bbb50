package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007 "On synopses for distinct-value estimation").
  *
  * Keeps the k smallest DISTINCT hash values seen per group. With values
  * hashed uniformly into [0, 2^60), the k-th smallest hash h_k estimates
  * the distinct count as (k−1)·2^60 / h_k; fewer than k distinct hashes
  * means the sketch IS the exact distinct set.
  *
  * Why this and not `approx_count_distinct`: HyperLogLog register layout
  * is engine-internal, so no external oracle can replay it. KMV built on
  * a portable md5-derived hash is replayable anywhere (the DuckDB oracle
  * recomputes the identical sketch with a window row_number), giving an
  * APPROXIMATE operator an EXACT cross-engine correctness gate.
  *
  * Scale: this is the 100 TB answer to exact COUNT(DISTINCT) — state is
  * k longs per group regardless of input size, partial aggregation
  * combines map-side (the shuffle carries one ≤k-array per group per
  * partition, not one row per distinct value), and merge is a sorted-
  * array merge. Exact distinct on a high-cardinality column shuffles
  * every distinct value; this shuffles k·8 bytes per group.
  */
object KmvSketch {

  /** Sorted ascending, distinct, length ≤ k. */
  def aggregator(k: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    new Aggregator[Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray

      override def reduce(b: Array[Long], h: Long): Array[Long] = {
        val pos = java.util.Arrays.binarySearch(b, h)
        if (pos >= 0) return b // already in the sketch
        val ip = -(pos + 1) // insertion point
        if (b.length >= k && ip >= k) return b // larger than the k-th min
        val keep = math.min(b.length + 1, k)
        val out = new Array[Long](keep)
        System.arraycopy(b, 0, out, 0, ip)
        out(ip) = h
        System.arraycopy(b, ip, out, ip + 1, keep - ip - 1)
        out
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.isEmpty) return b
        if (b.isEmpty) return a
        val out = new Array[Long](math.min(a.length + b.length, k))
        var i = 0; var j = 0; var n = 0
        while (n < out.length && (i < a.length || j < b.length)) {
          val v =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
            else { val x = b(j); j += 1; x }
          if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
        }
        if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      }

      override def finish(b: Array[Long]): Array[Long] = b

      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Column form: the sketch (sorted ≤k minima) of a long-hash column. */
  def apply(c: Column, k: Int): Column = udaf(aggregator(k)).apply(c)
}
