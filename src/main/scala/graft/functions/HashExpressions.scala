package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared MD5 machinery for the signature expressions. Digest instances
  * are thread-local (MessageDigest is stateful and not thread-safe);
  * hex is lowercase to match `md5()` in both Spark SQL and DuckDB — the
  * signatures these expressions produce must be bit-identical to the
  * SQL formulations the oracle replays.
  */
private[functions] object Md5 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(bytes)
  }

  private val hexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Value of hex digit `c` (0-based from the left) of an MD5 digest. */
  def hexNibble(d: Array[Byte], c: Int): Int =
    if ((c & 1) == 0) (d(c >> 1) >> 4) & 0xf else d(c >> 1) & 0xf
}

/** SimHash signature over a token array — the whole per-document
  * aggregation in ONE expression evaluation, no explode, no shuffle.
  *
  * Semantics are exactly the portable-SQL formulation the DuckDB oracle
  * replays (d4): per token take md5 hex; hex digit j/4's bit (j mod 4)
  * votes ±1 on signature bit j; the signature packs the positive-sum
  * bits. Eval-only (CodegenFallback): MD5 dominates the cost, codegen
  * would only inline the loop shell.
  *
  * Reference analog: TF-IDF near-dup detection (notebook
  * `remove_dup_article`); SimHash is the training-data-scale variant —
  * 8 bytes of state per document.
  */
case class TokenSimHash(child: Expression, bits: Int = 32)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 64 && bits % 4 == 0, "bits must be 4..64, nibble-aligned")

  override def dataType: DataType = LongType
  override def prettyName: String = "token_simhash"

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sums = new Array[Int](bits)
    var i = 0
    while (i < toks.numElements()) {
      val d = Md5.digest(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val v = Md5.hexNibble(d, j >> 2)
        sums(j) += (((v >> (j & 3)) & 1) << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSimHash =
    copy(child = newChild)
}

/** MinHash signature (array of `seeds` hex-string minima) over the word
  * n-gram shingles of a token array — shingling fused in, so the whole
  * per-document signature is one expression evaluation (d3's
  * explode → 12 min-aggregations collapse into a map-side projection).
  *
  * Portable semantics shared with the DuckDB oracle: shingle_i = tokens
  * i..i+n-1 joined by " " (short tail when fewer than n tokens, exactly
  * like `wordShinglesTokens`); signature[s] = min over shingles of
  * md5("<s>:<shingle>"). Minima are unaffected by duplicate shingles, so
  * skipping the distinct changes nothing.
  */
case class MinHashShingles(child: Expression, n: Int = 3, seeds: Int = 12)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && seeds > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_shingles"

  private val seedPrefixes = (0 until seeds).map(s => s"$s:").toArray

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val nShingles = math.max(sz - n + 1, 1)
    val minima = new Array[String](seeds)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      val end = math.min(i + n, sz)
      var k = i
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(toks.getUTF8String(k).toString)
        k += 1
      }
      val shingle = sb.toString
      var s = 0
      while (s < seeds) {
        val h = Md5.hex(Md5.digest(
          (seedPrefixes(s) + shingle).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        if (minima(s) == null || h.compareTo(minima(s)) < 0) minima(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(minima.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003)
  * over an already-normalized document in ONE expression evaluation —
  * the whole per-gram pipeline (k-gram md5, position tag, w-window
  * sliding minimum, consecutive-selection dedup) fused per document.
  *
  * Semantics are EXACTLY the portable-SQL formulation the d15/t16
  * oracles replay (and the former explode+window dataflow computed):
  * for 1-based character position p in [1, numChars − k + 1],
  * h(p) = first 7 hex digits of md5(utf8(substring(t, p, k))) as an
  * integer, v(p) = h(p)·2^32 + (2^32 − 1 − p); each window end
  * e ∈ [w, n] selects min v over [e−w+1, e]; consecutive equal
  * selections collapse; a selection unpacks to
  * (pos = 2^32 − 1 − (v mod 2^32), fp = v div 2^32).
  *
  * Optimization r14 (guide §2.4 + §4): the dataflow form exploded ONE
  * ROW PER CHARACTER (~16.5M rows at sf0.1), shuffled them by doc id
  * and ran two window sorts — all to compute a per-document function.
  * Fusing it removes the per-gram exchange and both sorts while the
  * md5 work (the true cost) is unchanged; character semantics ride
  * UTF8String.substringSQL, the exact substring() the SQL form used.
  * Eval-only (CodegenFallback): MD5 dominates, codegen would only
  * inline the loop shell — the MinHashShingles precedent.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, s"k=$k and w=$w must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val n = s.numChars() - (k - 1)
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // STREAMING sliding minimum over the v-sequence with a monotonic
    // min-deque (optimization r15, ADVICE r14): the former form
    // buffered vs[n] — 8 bytes per character concentrated in ONE
    // expression evaluation, at odds with corpus-linear claims for a
    // pathological giant document — and rescanned w values per window
    // (O(n·w)). The deque holds ≤ w candidates (O(w) memory), each v
    // pushed/popped at most once (O(n) total). v's are pairwise
    // distinct (the position is packed into the low bits), so the
    // window minimum is unique and the selection sequence is
    // bit-identical to the rescan (WinnowingSpec pins it against the
    // original dataflow replica).
    val qv = new Array[Long](w) // ring: candidate v's, increasing
    val qp = new Array[Int](w)  // ring: their positions
    var qh = 0
    var qt = 0 // deque = ring slots [qh, qt); size = qt - qh ≤ w
    val out = new java.util.ArrayList[Any](math.min(n, 2 * n / w + 1))
    var last = -1L
    var p = 1
    while (p <= n) {
      val d = Md5.digest(s.substringSQL(p, k).getBytes)
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 4) | Md5.hexNibble(d, i); i += 1 }
      val v = h * 4294967296L + (4294967295L - p)
      // expire the front before pushing (window for end p is
      // [p − w + 1, p]) so the ring never exceeds w entries
      while (qt > qh && qp(qh % w) < p - w + 1) qh += 1
      while (qt > qh && qv((qt - 1) % w) > v) qt -= 1
      qv(qt % w) = v
      qp(qt % w) = p
      qt += 1
      if (p >= w) {
        val vmin = qv(qh % w)
        if (out.isEmpty || vmin != last) {
          out.add(org.apache.spark.sql.catalyst.InternalRow(
            4294967295L - (vmin % 4294967296L), vmin >>> 32))
          last = vmin
        }
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
