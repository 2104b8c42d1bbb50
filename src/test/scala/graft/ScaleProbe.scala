package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-headroom probe (throwaway; backs PERF.md §scale): the dedup and
  * ANN families at 1× (sf0.1: 5 000 docs) vs a synthetic 10× corpus
  * (50 000 docs). Subquadratic scaling is the claim under test — a
  * banded/sketched operator should grow ≈10-15× in wall-clock and
  * output, never ≈100×.
  *
  * The 10× corpus replicates sf0.1 ten times with per-copy salting so
  * copies are NOT near-dups of each other (a salt token spliced into
  * every 5th position rewrites ≈60% of 3-gram shingles → cross-copy
  * Jaccard ≈0.25, safely under every 0.5 threshold); embeddings get a
  * per-copy cyclic rotation (norm-preserving, ≈orthogonal to the
  * original), so per-copy near-dup/ANN structure is preserved and the
  * workload density per document stays constant — pure size scaling.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val sf1 = "/root/testdata/sf0.1"
    val sf10 = "/tmp/graft_scale10"
    val copies = 10

    // ---- build the 10× corpus (idempotent) ----
    if (!new java.io.File(s"$sf10/documents.parquet/_SUCCESS").exists()) {
      val docs = spark.read.parquet(s"$sf1/documents.parquet")
      val salted = (0 until copies).map { c =>
        if (c == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
          .withColumn("text", array_join(flatten(transform(
            split(col("text"), "\\s+"),
            (x, i) => when(i % 5 === 4,
                array(x, concat(lit(s"sc${c}x"), (i % 97).cast("string"))))
              .otherwise(array(x)))), " "))
      }.reduce(_ unionByName _)
      salted.write.mode("overwrite").parquet(s"$sf10/documents.parquet")

      val emb = spark.read.parquet(s"$sf1/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).first().getInt(0)
      val rotated = (0 until copies).map { c =>
        if (c == 0) emb
        else emb
          .withColumn("vec_id", col("vec_id") + lit(c * 10000000L))
          .withColumn("embedding", concat(
            slice(col("embedding"), c * 5 + 1, dim - c * 5),
            slice(col("embedding"), 1, c * 5)))
      }.reduce(_ unionByName _)
      rotated.write.mode("overwrite").parquet(s"$sf10/embeddings.parquet")
    }
    // 10× lineitem for the graph family: per-copy key offsets keep the
    // copies DISJOINT (10 isomorphic co-purchase graphs), so node and
    // edge counts scale exactly 10× with per-node degree unchanged —
    // pure size scaling for an iterative graph job
    if (!new java.io.File(s"$sf10/lineitem.parquet/_SUCCESS").exists()) {
      val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      (0 until copies).map { c =>
        if (c == 0) li
        else li
          .withColumn("l_orderkey", col("l_orderkey") + lit(c * 10000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(c * 10000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$sf10/lineitem.parquet")
    }

    // 10× events for the funnel family: per-copy user/event-id offsets
    // keep users DISJOINT (10× users, per-user event density unchanged)
    // — pure size scaling for a per-user window pass
    if (!new java.io.File(s"$sf10/events.parquet/_SUCCESS").exists()) {
      val ev = spark.read.parquet(s"$sf1/events.parquet")
      (0 until copies).map { c =>
        if (c == 0) ev
        else ev
          .withColumn("event_id", col("event_id") + lit(c * 10000000L))
          .withColumn("user_id", col("user_id") + lit(c * 10000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$sf10/events.parquet")
    }

    def timedRows(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      SparkHygiene.dropAllPersisted(spark)
      (sec, n)
    }

    // JVM warmup (same as Bench)
    spark.read.parquet(s"$sf1/documents.parquet").groupBy("lang").count()
      .write.format("noop").mode("overwrite").save()

    for (q <- Seq("d2_jaccard_pairs", "d3_minhash_pairs", "d15_containment",
        "d16_jaccard_estimate", "s7_ann_pq", "d17_boilerplate_strip",
        "s8_knn_graph",
        // r10 additions: PassJoin edit-distance (the salted copies keep
        // their first words, so cross-copy 18-24-char keys are TRUE
        // zero-distance dups — output grows ~copies² by semantics; the
        // claim under test is wall tracking OUTPUT, not corpus²) and
        // BM25 (fixed query set → flat expected)
        "d21_edit_distance", "s10_bm25_topk",
        // round-10 post-close additions: iterative integer PageRank
        // (10 disjoint graph copies → nodes/edges ×10; wall should
        // track edges ≈linearly — one shuffle per iteration, shuffle
        // volume ∝ edges) and the CMS sketch (corpus ×10 but the
        // exchange is the fixed 1024-cell table — wall is scan-bound,
        // ≤ linear, state flat)
        "g1_pagerank", "t28_cms_heavy",
        // round-11 additions: min-label propagation (one exchange per
        // round over the part↔supplier bipartite graph; suppliers are
        // shared across copies so their degree grows 10× — wall should
        // track edges), k-core peeling (disjoint co-purchase copies —
        // per-round aggregate + two semi joins, edge rows only
        // shrink), two-level IVFADC (fixed query set over 10× corpus —
        // the probed-list scan grows ∝ corpus/nCentroids), and the
        // one-pass funnel (disjoint user copies — one exchange, wall
        // ∝ events)
        "g3_label_prop", "g4_kcore", "s13_ivf_pq", "w24_funnel")) {
      val (s1, n1) = timedRows(q, sf1)
      val (s10, n10) = timedRows(q, sf10)
      println(f"SCALE $q 1x=${s1}%.2fs/${n1} rows  10x=${s10}%.2fs/${n10} rows" +
        f"  time_ratio=${s10 / s1}%.1f rows_ratio=${if (n1 > 0) n10.toDouble / n1 else -1}%.1f")
    }

    // join-work counter: winnowing fp document frequency — sum(df²) is
    // the candidate row count the d15 equi-join grinds through
    for ((tag, dir) <- Seq("1x" -> sf1, "10x" -> sf10)) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val fps = graft.operators.Winnowing
        .fingerprints(docs, "doc_id", "text", 24, 8)
        .select(col("doc_id"), col("fp")).distinct()
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .select(lit(tag).as("scale"), count(lit(1)).as("n_fps"),
          sum(col("df") * col("df")).as("sum_df2"), max(col("df")).as("max_df"))
        .show(false)
      SparkHygiene.dropAllPersisted(spark)
    }
    spark.stop()
  }
}
