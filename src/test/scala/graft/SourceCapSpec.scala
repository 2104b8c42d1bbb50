package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Semantics of t17_source_cap: per-source quality-ranked capping
  * (domain rebalancing). The oracle gate proves engine portability;
  * this spec pins WHAT survives — each source keeps exactly its top-10
  * documents under (quality desc, doc_id asc), re-derived here with a
  * plain Scala sort instead of the operator's window so the cap logic
  * is checked against an independent implementation.
  */
class SourceCapSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("t17 source cap: exactly 10 per source, ranks 1..10, and the " +
    "kept set is the independently re-derived quality top-10") {
    val out = TextQueries.queries("t17_source_cap")(spark, sfDir).collect()
    val bySource = out.groupBy(_.getString(1))
    assert(bySource.nonEmpty)
    for ((src, rows) <- bySource) {
      assert(rows.length == 10, s"source '$src' kept ${rows.length} docs, want 10")
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 10L),
        s"ranks for '$src' are not exactly 1..10")
    }

    // independent reference: score every doc with the same expression,
    // then rank per source with a driver-side sort (no window involved)
    val scored = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        TextFns.qualityScore(col("text")).as("quality"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = scored.groupBy(_._2).map { case (src, rows) =>
      src -> rows.sortBy(t => (-t._3, t._1)).take(10).map(_._1).toSet
    }
    for ((src, rows) <- bySource)
      assert(rows.map(_.getLong(0)).toSet == expected(src),
        s"kept set for '$src' differs from the re-derived top-10")
  }
}
