package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** t20's digest contract: invariant to partitioning and row order,
  * sensitive to any single-row change.
  */
class TableDigestSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)],
                        parts: Int, shuffled: Boolean): String = {
    val dir = Files.createTempDirectory("digest_docs").toString
    val base = if (shuffled) scala.util.Random.shuffle(rows) else rows
    base.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def digests(dir: String): Map[Int, (Long, Long)] =
    QueryCatalog.queries("t20_table_digest")(spark, dir)
      .select(col("shard"), col("n_rows"), col("digest"))
      .as[(Int, Long, Long)].collect()
      .map { case (s, n, d) => s -> (n, d) }.toMap

  test("digest is invariant to partitioning and row order, " +
    "and flips on a one-row mutation") {
    val rows = (1L to 300L).map(i => (i, s"text body $i", "en", s"src${i % 7}"))
    val a = digests(writeDocs(rows, parts = 1, shuffled = false))
    val b = digests(writeDocs(rows, parts = 13, shuffled = true))
    assert(a == b, "same content must digest identically under any layout")
    assert(a.keySet == Set(0, 1, 2, 3))

    // one character changed in one row: exactly that row's shard moves
    val mutated = rows.map { case r @ (i, t, l, s) =>
      if (i == 150L) (i, t + "!", l, s) else r
    }
    val c = digests(writeDocs(mutated, parts = 13, shuffled = true))
    val moved = a.keySet.filter(k => a(k) != c(k))
    assert(moved.size == 1, s"exactly one shard digest must change, got $moved")
    assert(a(moved.head)._1 == c(moved.head)._1, "row count unchanged")
  }
}
