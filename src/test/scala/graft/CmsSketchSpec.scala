package graft

import org.apache.spark.sql.functions._

import graft.operators.CmsSketch

/** Count-min sketch: the over-estimate guarantee, exactness on
  * collision-free rows, partitioning independence of the cell table,
  * and the bounded-state claim (≤ d·256 cells however large the input).
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side replica of CmsSketch.cellOf (first two md5 hex digits). */
  private def cellOf(key: String, j: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cms$j:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 2), 16)
  }

  // keys k0..k59 with frequency i+1 — 1830 items total
  private val freqs: Map[String, Long] =
    (0 until 60).map(i => s"k$i" -> (i + 1).toLong).toMap
  private val items: Seq[String] =
    freqs.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }

  private def estimates(parts: Int): Map[String, Long] = {
    val df = spark.createDataset(items).repartition(parts).toDF("tok")
    val cells = CmsSketch.build(df, "tok", d = 4)
    val probes = freqs.keys.toSeq.toDF("tok")
    CmsSketch.estimate(probes, cells, "tok", d = 4)
      .as[(String, Long)].collect().toMap
  }

  test("estimate >= exact for every key; exact when a row is collision-free") {
    val est = estimates(5)
    freqs.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never under-count ($k)")
    }
    // a key whose cell in SOME row j is shared with no other key must
    // be estimated exactly (the min picks that clean row)
    val cleanKeys = freqs.keys.filter { k =>
      (0 until 4).exists { j =>
        val c = cellOf(k, j)
        freqs.keys.forall(o => o == k || cellOf(o, j) != c)
      }
    }
    assert(cleanKeys.nonEmpty, "test corpus should have collision-free keys")
    cleanKeys.foreach(k => assert(est(k) == freqs(k), s"clean key $k"))
  }

  test("sketch and estimates are partitioning-independent") {
    assert(estimates(1) == estimates(7))
  }

  test("cell table is bounded by d*256 and conserves total mass per row") {
    val df = items.toDF("tok")
    val cells = CmsSketch.build(df, "tok", d = 4)
      .as[(Int, Int, Long)].collect()
    assert(cells.length <= 4 * 256)
    assert(cells.forall { case (r, c, _) => r >= 0 && r < 4 && c >= 0 && c < 256 })
    // every hash row sees every insertion exactly once
    val perRow = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    (0 until 4).foreach(j => assert(perRow(j) == items.size.toLong, s"row $j"))
  }

  test("never-inserted probe estimates 0 (or collision noise only)") {
    val df = items.toDF("tok")
    val cells = CmsSketch.build(df, "tok", d = 4)
    val est = CmsSketch.estimate(Seq("absent-key-xyz").toDF("tok"), cells, "tok", 4)
      .as[(String, Long)].head()._2
    // upper bound: total mass / w per row in expectation; exact-0 when
    // some row's cell is untouched — just pin the upper-bound property
    assert(est >= 0 && est <= items.size.toLong)
  }
}
