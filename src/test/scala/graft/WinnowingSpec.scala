package graft

import java.security.MessageDigest

import graft.operators.Winnowing

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Reference winnowing, straight from the paper: hash every k-gram,
    * take the min of each w-window (ties → rightmost position), keep a
    * selection only when it differs from the previous window's. Runs in
    * the driver over the same normalized text and the same 28-bit md5
    * hash as the operator.
    */
  private def naive(text: String, k: Int, w: Int): Seq[(Long, Long)] = {
    val t = text.trim.toLowerCase.replaceAll("\\s+", " ")
    if (t.length < k + w - 1) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val hashes = (0 to t.length - k).map { i =>
      val hex = md.digest(t.substring(i, i + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) // 28-bit
    }
    var prev = -1L
    val out = Seq.newBuilder[(Long, Long)]
    for (end <- (w - 1) until hashes.length) {
      val window = (end - w + 1) to end
      // min hash, ties broken by the RIGHTMOST position
      val sel = window.minBy(i => (hashes(i), -i))
      if (sel != prev) { out += ((sel + 1L, hashes(sel))); prev = sel }
    }
    out.result()
  }

  private def run(docs: Seq[(Long, String)], k: Int = 8, w: Int = 4): Map[Long, Seq[(Long, Long)]] =
    Winnowing.fingerprints(docs.toDF("id", "text"), "id", "text", k, w)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("matches the paper algorithm exactly on varied prose") {
    val docs = Seq(
      1L -> "The quick brown fox jumps over the lazy dog near the river bank.",
      2L -> "Sphinx of black quartz, judge my vow; pack my box with five dozen jugs.",
      3L -> "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all k-grams identical
      4L -> "Markets rallied on Tuesday as central banks signalled steady rates.")
    val got = run(docs)
    for ((id, text) <- docs)
      assert(got.getOrElse(id, Seq.empty) == naive(text, 8, 4).sortBy(_._1),
        s"doc $id fingerprints diverge from the reference algorithm")
  }

  test("identical normalized text yields identical fingerprints (case/whitespace invariant)") {
    val docs = Seq(
      1L -> "Shared   Body OF text long enough to fingerprint reliably",
      2L -> "shared body of\ttext long enough to fingerprint reliably")
    val got = run(docs)
    assert(got(1L).nonEmpty && got(1L) == got(2L))
  }

  test("coverage guarantee: selected positions are never more than w apart") {
    val text = ('a' to 'z').mkString(" ") * 4
    val got = run(Seq(1L -> text))(1L)
    // re-derive window-end coverage from the naive run: every w-window
    // of k-grams must contain a selected position
    val sel = got.map(_._1).toSet
    val t = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val nGrams = t.length - 8 + 1
    for (end <- 4 to nGrams)
      assert((end - 3 to end).exists(p => sel.contains(p.toLong)),
        s"window ending at $end has no selected fingerprint")
  }

  test("short documents yield no fingerprints") {
    assert(run(Seq(1L -> "tiny", 2L -> "exactly 10")).isEmpty)
    // k + w - 1 = 11 normalized chars is the minimum for one window
    assert(run(Seq(3L -> "elevenchars")).nonEmpty)
  }
}
