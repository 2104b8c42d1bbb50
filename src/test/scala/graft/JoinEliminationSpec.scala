package graft

import org.apache.spark.sql.functions._

import graft.plans.JoinElimination

/** The PK-FK elimination must (1) actually DELETE the join — the dim
  * scan and the join operator vanish from the physical plan — while
  * (2) computing the same answer as the genuine join (RI holds in the
  * TPC-H-ish generator: every l_orderkey exists once in orders), and
  * (3) refuse every shape the contract doesn't cover: a dim column in
  * the output, a dim-side filter, an unregistered session.
  */
class JoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ri = JoinElimination.RiDef(
    factPathSuffix = s"$sf/lineitem.parquet",
    dimPathSuffix = s"$sf/orders.parquet",
    factKey = "l_orderkey", dimKey = "o_orderkey")

  private def joined() = Tables.lineitem(spark, sf)
    .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))

  private def aggOf(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("l_returnflag"))
    .agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDecimal(2)))).toMap

  test("the join and the dim scan VANISH from the plan, and the answer " +
    "equals the genuine join (RI holds in the generator)") {
    val truth = collectMap(aggOf(joined())) // unregistered: real join
    try {
      JoinElimination.register(spark, ri)
      val df = aggOf(joined())
      assert(collectMap(df) == truth,
        "elimination must be logically invisible under RI")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("orders.parquet"), s"dim scan must be gone:\n$p")
      assert(!p.toLowerCase.contains("join"), s"join must be gone:\n$p")
    } finally JoinElimination.clear(spark)
  }

  test("a Project parent (row-level query) is eliminated too") {
    try {
      JoinElimination.register(spark, ri)
      val df = joined().select(col("l_orderkey"), col("l_quantity"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("orders.parquet") && !p.toLowerCase.contains("join"),
        s"fact-only projection over the join must eliminate:\n$p")
      assert(df.count() == Tables.lineitem(spark, sf).count(),
        "row multiplicity must equal the fact table")
    } finally JoinElimination.clear(spark)
  }

  test("a FACT-side filter rides along; the join still eliminates") {
    try {
      JoinElimination.register(spark, ri)
      val df = Tables.lineitem(spark, sf)
        .filter(col("l_quantity") > 25)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("orders.parquet") && !p.toLowerCase.contains("join"),
        s"fact-side filter must not block elimination:\n$p")
      assert(df.count() ==
        Tables.lineitem(spark, sf).filter(col("l_quantity") > 25).count())
    } finally JoinElimination.clear(spark)
  }

  test("LEFT OUTER elimination: the null-producing dim side drops on " +
    "pk uniqueness alone, and the answer equals the genuine left join") {
    val lj = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
    val truth = lj.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      JoinElimination.register(spark, ri)
      val df = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"), "left_outer")
        .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == truth)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("orders.parquet") && !p.toLowerCase.contains("join"),
        s"left-outer with fact-only refs must eliminate:\n$p")
      // a RIGHT-side fact (dim on the preserved side) must refuse: the
      // outer join would null-extend FACT rows, not dim rows
      val p2 = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("l_orderkey") === col("o_orderkey"), "left_outer")
        .select(col("o_orderpriority"))
        .queryExecution.executedPlan.toString
      assert(p2.toLowerCase.contains("join"),
        s"dim-preserved left join must keep the join:\n$p2")
    } finally JoinElimination.clear(spark)
  }

  test("COMPOSITION: elimination unlocks the MV rewrite in the same " +
    "optimizer fixed point — the join-aggregate is served from the " +
    "rollup MV, scanning NEITHER base table") {
    import graft.plans.MvRewrite
    val truth = collectMap(aggOf(joined()))
    // a rollup MV over the FACT table (q33's definition)
    val mvDir = SparkHygiene.scratchDir("elim_mv")
    Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
      .write.mode("overwrite").parquet(mvDir)
    try {
      JoinElimination.register(spark, ri)
      MvRewrite.register(spark, MvRewrite.MvDef(
        factPathSuffix = s"$sf/lineitem.parquet",
        mvPlan = spark.read.parquet(mvDir).queryExecution.analyzed,
        groupCols = Set("l_returnflag", "l_linestatus"),
        countCol = "n_rows",
        sumCols = Map("l_quantity" -> "sum_qty")))
      val df = aggOf(joined())
      assert(collectMap(df) == truth,
        "the composed rewrite must be logically invisible")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(mvDir.split('/').last),
        s"the MV must serve the query:\n$p")
      assert(!p.contains("orders.parquet") && !p.contains("lineitem.parquet"),
        s"NEITHER base table may be scanned — elimination then MV:\n$p")
      assert(!p.toLowerCase.contains("join"), s"join must be gone:\n$p")
    } finally {
      JoinElimination.clear(spark)
      MvRewrite.clear(spark)
    }
  }

  test("refusals: a dim column in the output, a dim-side filter, and an " +
    "unregistered session all keep the join") {
    val shapes: Seq[() => org.apache.spark.sql.DataFrame] = Seq(
      // dim column used → the join is load-bearing
      () => joined().select(col("l_orderkey"), col("o_orderpriority")),
      // dim-side filter → multiplicity changes; contract doesn't cover it
      () => Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey")))
    try {
      JoinElimination.register(spark, ri)
      shapes.foreach { mk =>
        val p = mk().queryExecution.executedPlan.toString
        assert(p.contains("orders.parquet"),
          s"uncovered shape must keep the dim scan:\n$p")
      }
      // sibling session: registration must not leak
      val s2 = spark.newSession()
      GraftExtensions.register(s2)
      val p2 = Tables.lineitem(s2, sf)
        .join(Tables.orders(s2, sf), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p2.contains("orders.parquet"),
        s"sibling session must keep its join:\n$p2")
    } finally JoinElimination.clear(spark)
  }
}
