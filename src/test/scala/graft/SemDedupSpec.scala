package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.SemDedup

/** SemDeDup semantics: one verdict per row, keep-first survivors, drops
  * sound against the GLOBAL near-dup baseline (bucket restriction may
  * miss cross-bucket pairs — the published trade — but must never
  * invent a drop), and exact duplicates always deduped (identical
  * vectors share a bucket by construction).
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("one verdict per row; every drop has a lower-id global neighbor " +
    "above tau (soundness vs the d5-shape baseline)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val out = SemDedup.semanticDedup(emb, "vec_id", "embedding", tau = 0.45)
      .persist()
    assert(out.count() == n, "one output row per corpus row")
    assert(out.select(col("vec_id")).distinct().count() == n)
    val globalDroppable = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
      .filter(round(VectorFns.dotProduct(col("va"), col("vb")), 4) >= 0.45)
      .select(col("b")).distinct()
    val unsound = out.filter(!col("kept")).select(col("vec_id").as("b"))
      .join(globalDroppable, Seq("b"), "left_anti").count()
    assert(unsound == 0,
      s"$unsound dropped rows have NO global near-dup neighbor — invented drops")
    out.unpersist()
  }

  test("planted exact duplicates land in the same bucket and the higher " +
    "id is dropped; originals survive (keep-first)") {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    val dups = base.filter(col("vec_id") < 2)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val out = SemDedup.semanticDedup(base.unionByName(dups),
      "vec_id", "embedding", tau = 0.9999, nCentroids = 4, iters = 1)
    val verdicts = out.select(col("vec_id"), col("kept"))
      .as[(Long, Boolean)].collect().toMap
    assert(!verdicts(100L) && !verdicts(101L),
      "planted exact duplicates must be dropped")
    assert(verdicts(0L) && verdicts(1L), "the lower id must survive")
    assert(verdicts.count(!_._2) == 2, "nothing else clears tau=0.9999")
  }
}
