package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for the headline catalog queries into
  * `artifacts/PLANS_r14.txt` — the reviewable evidence that scans
  * prune/push down, dims broadcast, aggregates partial map-side, and
  * the rewrites fire. Batch queries only: constructing the w9/w15/w18
  * streaming entries RUNS their streaming drain by design.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val sf = "/root/testdata/sf0.001"
    val names = Seq(
      // relational plan shapes
      "q1_agg", "q3_topk_join", "q5_region_revenue", "q6_forecast_revenue",
      "q8_market_share", "q10_returned_customers", "q13_cust_dist",
      "q15_top_supplier", "q16_notin", "q17_small_orders", "q19_disjunctive",
      "q20_dominant_suppliers", "g1_pagerank",
      // dedup / similarity
      "d2_jaccard_pairs", "d5_embed_neardup", "d13_semdedup", "s7_ann_pq",
      // text / training ops
      "t12_bigram_lm", "t25_seq_chunk", "t28_cms_heavy", "m6_zorder_cluster",
      // temporal / reporting
      "j8_interval_join", "a16_pivot", "a13_cum_distinct", "w17_rank_report",
      // continuation heads: composed pipeline, graph, subquery
      // decorrelation, hopping windows
      "t29_curation_pipeline", "g2_triangles", "j14_lateral_top1",
      "q24_scalar_subquery", "w21_hopping_window", "q23_ri_audit",
      "s11_filtered_knn", "d24_schema_union",
      // round-11 heads: TPC-H Q9/Q12 shapes, adaptive join, lakehouse
      // merge, DPP, propagation operators, IVM, phrase/window passes
      "q9_profit_rollup", "q12_shipmode", "j15_adaptive_join",
      "j16_merge_upsert", "q28_dpp_prune", "g3_label_prop", "g5_bfs_hops",
      "q27_incremental_agg", "q30_incremental_distinct", "w24_funnel",
      "s13_ivf_pq", "s14_phrase_search", "t33_weighted_sample",
      "d25_sorted_neighborhood", "q31_runtime_filter",
      // session-2 batch heads (the materializing queries — q33/q34/
      // j18/p23 — run side effects on construction and return a
      // checkpoint read, so their plan evidence lives in their specs)
      "s15_hybrid_rrf", "g6_hits", "j19_temporal_dim", "a21_unpivot",
      // round-12 heads: the training-release chain (its plan is the
      // post-manifest stages — the corpus-width prefix materializes at
      // construction by design; the census pin lives in PlanSpec).
      // q35 materializes under registered rules and w29 drains a
      // stream on construction — their plan evidence lives in PlanSpec
      // and the oracle rows.
      "t34_training_manifest", "d18_incremental_dedup",
      // round-14 heads: the custom physical as-of operator
      "j20_asof_exec", "j21_asof_tolerance",
      // session-3 heads: gap-fill resample (the only corpus-sized op
      // must be the first rollup). p31/j23/q40 materialize snapshot
      // tables and run maintenance commits on construction — their
      // plan/exchange evidence lives in SnapshotsV2Spec,
      // SnapshotCatalogSpec, and IncrementalMvSpec.
      "w34_gapfill",
      // session-4 heads: DML queries (p35/p36) run UPDATE/MERGE at
      // construction and return the post-DML catalog read — the
      // ReplaceData/group-pruning plan evidence lives in
      // SnapshotRowLevelSpec; p37's returned read shows the V2 scan
      // under the log-resolved (evolved) schema
      "p37_schema_evolution",
      // round-15 heads: p39's returned read is the DV'd V2 scan (row
      // path — no ColumnarToRow — with the suppression applied by the
      // readers, not the plan); p41 shows the pushed STRING filter and
      // its file-skip census in the scan description; p42 shows the V2
      // scan under the renamed (id-mapped) schema. p40's merge runs at
      // construction — its evolution/row-level evidence lives in
      // SchemaEvolutionSpec.
      "p39_dv_delete", "p41_string_prune", "p42_rename")
    val out = new java.io.PrintWriter("artifacts/PLANS_r14.txt")
    out.println("Formatted physical plans, sf0.001, local[4] — regenerate " +
      "with `sbt \"Test/runMain graft.PlanDump\"`.\n")
    names.foreach { n =>
      out.println(s"========== $n ==========")
      out.println(SparkEntry.queries(n)(spark, sf)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
      SparkHygiene.dropAllPersisted(spark)
    }
    out.close()
    spark.stop()
  }
}
