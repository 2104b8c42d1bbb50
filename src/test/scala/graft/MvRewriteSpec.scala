package graft

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** The MV rewrite must (1) actually SERVE the query — proven by a
  * deliberately perturbed MV showing up in the answer, the only test a
  * silently-not-firing rewrite cannot pass — (2) remove the fact scan
  * from the plan, (3) compute the exact rollup algebra when the MV is
  * truthful, and (4) refuse to fire for any query shape it cannot
  * translate (filters, unknown aggregates, non-covered groupings).
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def mkMv(truthful: Boolean): (String, MvRewrite.MvDef) = {
    val dir = SparkHygiene.scratchDir("mv_rewrite")
    val base = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
    val mv = if (truthful) base
      else base.withColumn("sum_qty", col("sum_qty") + lit(1000000))
    mv.write.mode("overwrite").parquet(dir)
    (dir, MvRewrite.MvDef(
      factPathSuffix = s"$sf/lineitem.parquet",
      mvPlan = spark.read.parquet(dir).queryExecution.analyzed,
      groupCols = Set("l_returnflag", "l_linestatus"),
      countCol = "n_rows",
      sumCols = Map("l_quantity" -> "sum_qty")))
  }

  test("min/max are self-mergeable: a min/max query over the fact is " +
    "served by the MV's per-group extremes") {
    val dir = SparkHygiene.scratchDir("mv_minmax")
    Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_extendedprice")).as("min_px"),
        max(col("l_extendedprice")).as("max_px"))
      .write.mode("overwrite").parquet(dir)
    def q() = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
    val truth = q().collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    try {
      MvRewrite.register(spark, MvRewrite.MvDef(
        factPathSuffix = s"$sf/lineitem.parquet",
        mvPlan = spark.read.parquet(dir).queryExecution.analyzed,
        groupCols = Set("l_returnflag", "l_linestatus"),
        countCol = "n_rows", sumCols = Map.empty,
        minCols = Map("l_extendedprice" -> "min_px"),
        maxCols = Map("l_extendedprice" -> "max_px")))
      val df = q()
      val got = df.collect().map(r =>
        r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(got == truth)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(dir.split('/').last) && !p.contains("lineitem.parquet"),
        s"min/max query must be MV-served:\n$p")
    } finally MvRewrite.clear(spark)
  }

  private def query() = Tables.lineitem(spark, sf)
    .groupBy(col("l_returnflag"))
    .agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDecimal(2)))).toMap

  test("rollup rewrite: grouping-subset query over the fact equals the " +
    "raw aggregate when the MV is truthful, and the fact scan disappears") {
    val truth = collectMap(query()) // registry empty: computed from fact
    val (dir, mvDef) = mkMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef)
      val df = query()
      assert(collectMap(df) == truth,
        "rewritten rollup must equal the from-scratch aggregate")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(dir.split('/').last),
        s"plan must scan the MV:\n$p")
      assert(!p.contains("lineitem.parquet"),
        s"fact scan must be GONE from the plan:\n$p")
    } finally MvRewrite.clear(spark)
  }

  test("the rewrite provably serves the query: a perturbed MV shows up " +
    "in the answer") {
    val truth = collectMap(query())
    val (_, mvDef) = mkMv(truthful = false)
    try {
      MvRewrite.register(spark, mvDef)
      val got = collectMap(query())
      assert(got.keySet == truth.keySet)
      got.foreach { case (k, (n, qty)) =>
        assert(n == truth(k)._1, "counts are un-perturbed and must agree")
        assert(qty.subtract(truth(k)._2).longValue() >= 1000000,
          s"perturbation missing for $k: the MV did not serve the query")
      }
    } finally MvRewrite.clear(spark)
  }

  test("q33's exact shape — sum under a presentation cast to double — " +
    "is rewrite-served") {
    val (dir, mvDef) = mkMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef)
      val df = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(dir.split('/').last) && !p.contains("lineitem.parquet"),
        s"the cast-wrapped sum must still translate:\n$p")
    } finally MvRewrite.clear(spark)
  }

  test("a filter over MV GROUPING columns translates — it filters rollup " +
    "groups exactly as it filtered fact rows — and stays rewrite-served") {
    val (dir, mvDef) = mkMv(truthful = true)
    val q = Tables.lineitem(spark, sf)
      .filter(col("l_linestatus") === "O")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
    val truth = collectMap(q)
    try {
      MvRewrite.register(spark, mvDef)
      val df = Tables.lineitem(spark, sf)
        .filter(col("l_linestatus") === "O")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      assert(collectMap(df) == truth)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(dir.split('/').last) && !p.contains("lineitem.parquet"),
        s"grouping-column filter must still be MV-served:\n$p")
    } finally MvRewrite.clear(spark)
  }

  test("registrations are session-scoped: a sibling session planning the " +
    "same fact aggregate is NOT rewritten (ADVICE r11)") {
    val (dir, mvDef) = mkMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef)
      // sibling session in the same JVM, same rule injected — the exact
      // cross-session leak surface the global registry had
      val s2 = spark.newSession()
      GraftExtensions.register(s2)
      val other = Tables.lineitem(s2, sf)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val p2 = other.queryExecution.executedPlan.toString
      assert(p2.contains("lineitem.parquet") && !p2.contains(dir.split('/').last),
        s"sibling session must keep its fact scan:\n$p2")
      // while the REGISTERING session is served by the MV
      val p1 = query().queryExecution.executedPlan.toString
      assert(p1.contains(dir.split('/').last) && !p1.contains("lineitem.parquet"),
        s"registering session must be MV-served:\n$p1")
    } finally MvRewrite.clear(spark)
  }

  // avg MV: pre-sum + per-column NON-NULL count (both Average partials)
  private def mkAvgMv(truthful: Boolean): (String, MvRewrite.MvDef) = {
    val dir = SparkHygiene.scratchDir("mv_avg")
    val base = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("double")).as("sum_qty"),
        count(col("l_quantity")).as("cnt_qty"))
    val mv = if (truthful) base
      else base.withColumn("sum_qty", col("sum_qty") + lit(1000000.0))
    mv.write.mode("overwrite").parquet(dir)
    (dir, MvRewrite.MvDef(
      factPathSuffix = s"$sf/lineitem.parquet",
      mvPlan = spark.read.parquet(dir).queryExecution.analyzed,
      groupCols = Set("l_returnflag", "l_linestatus"),
      countCol = "n_rows",
      sumCols = Map("l_quantity" -> "sum_qty"),
      cntCols = Map("l_quantity" -> "cnt_qty")))
  }

  private def avgQuery() = Tables.lineitem(spark, sf)
    .groupBy(col("l_returnflag"))
    .agg(avg(col("l_quantity").cast("double")).as("avg_qty"))

  test("avg is served from BOTH partial states (Σpre-sums / Σnon-null " +
    "counts) and equals the from-scratch average (VERDICT r12 #4)") {
    val truth = avgQuery().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (dir, mvDef) = mkAvgMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef)
      val df = avgQuery()
      val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == truth.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - truth(k)) < 1e-9, s"avg mismatch for $k") }
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(dir.split('/').last) && !p.contains("lineitem.parquet"),
        s"avg query must be MV-served:\n$p")
    } finally MvRewrite.clear(spark)
  }

  test("the avg rewrite provably serves the query: a perturbed pre-sum " +
    "visibly shifts the served average") {
    val truth = avgQuery().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (_, mvDef) = mkAvgMv(truthful = false)
    try {
      MvRewrite.register(spark, mvDef)
      avgQuery().collect().foreach { r =>
        assert(r.getDouble(1) > truth(r.getString(0)) + 1.0,
          s"perturbation missing for ${r.getString(0)}: avg not MV-served")
      }
    } finally MvRewrite.clear(spark)
  }

  test("count(x) — the non-null column count — is served from the same " +
    "per-column count state, and refuses without it") {
    val truth = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(col("l_quantity")).as("nq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (dir, mvDef) = mkAvgMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef)
      val df = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(count(col("l_quantity")).as("nq"))
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == truth)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(dir.split('/').last) && !p.contains("lineitem.parquet"),
        s"count(x) must be MV-served:\n$p")
      MvRewrite.clear(spark)
      MvRewrite.register(spark, mvDef.copy(cntCols = Map.empty))
      val p2 = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(count(col("l_quantity")).as("nq"))
        .queryExecution.executedPlan.toString
      assert(p2.contains("lineitem.parquet"),
        s"count(x) without the count state must keep the fact scan:\n$p2")
    } finally MvRewrite.clear(spark)
  }

  test("avg refuses the rewrite when the MV lacks the non-null-count " +
    "state — count(1) is NOT an acceptable denominator") {
    // MV with row counts + pre-sums but no cnt_qty registration
    val (_, mvDef) = mkAvgMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef.copy(cntCols = Map.empty))
      val p = avgQuery().queryExecution.executedPlan.toString
      assert(p.contains("lineitem.parquet"),
        s"avg without a per-column count must keep the fact scan:\n$p")
    } finally MvRewrite.clear(spark)
  }

  test("conservative matching: filters, unknown aggregates, and " +
    "non-covered groupings are left on the fact scan") {
    val (_, mvDef) = mkMv(truthful = true)
    try {
      MvRewrite.register(spark, mvDef)
      val li = Tables.lineitem(spark, sf)
      val shapes = Seq(
        // a filter on a NON-grouping column (the MV lost row identity)
        li.filter(col("l_quantity") > 10).groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n")),
        // an aggregate the MV has no state for
        li.groupBy(col("l_returnflag"))
          .agg(max(col("l_extendedprice")).as("mx")),
        // a grouping column outside the MV grouping
        li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n")))
      shapes.foreach { df =>
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("lineitem.parquet"),
          s"untranslatable shape must keep the fact scan:\n$p")
      }
    } finally MvRewrite.clear(spark)
  }
}
