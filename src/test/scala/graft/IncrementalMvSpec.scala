package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeleteRows, IncrementalMv}
import graft.operators.IncrementalMv.MvSpec
import graft.sources.Snapshots

/** Incremental MV maintenance: every refresh must equal the full
  * recompute of the same state over the base@to — across appends,
  * deletes (incl. a group's current min), updates (delete+append
  * pairing), group death, null-only groups — plus lineage tracking and
  * the no-op fast path.
  */
class IncrementalMvSpec extends SparkSpec {
  import spark.implicits._

  private val spec = MvSpec(groupCols = Seq("grp"),
    sumCols = Seq("v"), countCols = Seq("v"), minMaxCols = Seq("v"))

  private def rows(r: Seq[(Long, String, java.lang.Long)]): DataFrame =
    r.toDF("id", "grp", "v")

  /** sorted state rows (grp, n, sum_v, cnt_v, min_v, max_v) */
  private def state(df: DataFrame) =
    df.select($"grp", $"n", $"sum_v", $"cnt_v", $"min_v", $"max_v")
      .as[(String, Long, Option[Long], Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq

  private def assertMatchesRecompute(baseDir: String, mvDir: String): Unit = {
    val got = state(Snapshots.read(spark, mvDir))
    val want = state(IncrementalMv.fullState(
      Snapshots.read(spark, baseDir), spec))
    assert(got == want, s"\nrefreshed: $got\nrecompute: $want")
  }

  test("append-only refresh folds delta mins with least/greatest") {
    val base = SparkHygiene.scratchDir("imv_base1")
    val mv = SparkHygiene.scratchDir("imv_mv1")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))))
    IncrementalMv.initialize(spark, base, mv, spec)
    Snapshots.commit(spark, base, rows(Seq(
      (4L, "a", 3L), (5L, "b", 50L), (6L, "c", 7L))))
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    assertMatchesRecompute(base, mv)
    // the new min for 'a' came through the clean (least) path
    assert(state(Snapshots.read(spark, mv))
      .find(_._1 == "a").get._5.contains(3L))
  }

  test("deleting a group's current min forces the dirty recompute") {
    val base = SparkHygiene.scratchDir("imv_base2")
    val mv = SparkHygiene.scratchDir("imv_mv2")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 5L)))
      .repartition(2, $"id"))
    IncrementalMv.initialize(spark, base, mv, spec)
    DeleteRows.deleteKeys(spark, base, "id", keys = Seq(1L))
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    assertMatchesRecompute(base, mv)
    val a = state(Snapshots.read(spark, mv)).find(_._1 == "a").get
    assert(a == (("a", 2L, Some(50L), 2L, Some(20L), Some(30L))))
  }

  test("a fully-deleted group leaves the MV") {
    val base = SparkHygiene.scratchDir("imv_base3")
    val mv = SparkHygiene.scratchDir("imv_mv3")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", 1L), (2L, "b", 2L), (3L, "b", 3L))).repartition(2, $"id"))
    IncrementalMv.initialize(spark, base, mv, spec)
    DeleteRows.deleteKeys(spark, base, "id", keys = Seq(1L))
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    assertMatchesRecompute(base, mv)
    assert(state(Snapshots.read(spark, mv)).map(_._1) == Seq("b"))
  }

  test("delete+append pairing as an UPDATE across versions refreshes right") {
    val base = SparkHygiene.scratchDir("imv_base4")
    val mv = SparkHygiene.scratchDir("imv_mv4")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))).repartition(2, $"id"))
    IncrementalMv.initialize(spark, base, mv, spec)
    // "update" id=1: erase it, append its new image — one refresh folds
    // both commits, and the change feed pairs them as update pre/post
    DeleteRows.deleteKeys(spark, base, "id", keys = Seq(1L))
    Snapshots.commit(spark, base, rows(Seq((1L, "a", 99L))))
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    assertMatchesRecompute(base, mv)
    val a = state(Snapshots.read(spark, mv)).find(_._1 == "a").get
    assert(a._3.contains(119L) && a._6.contains(99L))
  }

  test("null measures: cnt drives sum/min/max nullability, n counts rows") {
    val base = SparkHygiene.scratchDir("imv_base5")
    val mv = SparkHygiene.scratchDir("imv_mv5")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", null), (2L, "a", null), (3L, "b", 7L))))
    IncrementalMv.initialize(spark, base, mv, spec)
    Snapshots.commit(spark, base, rows(Seq((4L, "a", null))))
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    assertMatchesRecompute(base, mv)
    val a = state(Snapshots.read(spark, mv)).find(_._1 == "a").get
    assert(a == (("a", 3L, None, 0L, None, None)))
  }

  test("no-op refresh commits nothing; lineage tracks the base version") {
    val base = SparkHygiene.scratchDir("imv_base6")
    val mv = SparkHygiene.scratchDir("imv_mv6")
    Snapshots.commit(spark, base, rows(Seq((1L, "a", 1L))))
    IncrementalMv.initialize(spark, base, mv, spec)
    assert(IncrementalMv.lastBaseVersion(mv) == 1)
    val v0 = Snapshots.currentVersion(mv)
    assert(IncrementalMv.refresh(spark, base, mv, "id", spec) == v0)
    assert(Snapshots.currentVersion(mv) == v0)
    Snapshots.commit(spark, base, rows(Seq((2L, "a", 2L))))
    Snapshots.commit(spark, base, rows(Seq((3L, "b", 3L))))
    // one refresh folds BOTH pending commits
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    assert(IncrementalMv.lastBaseVersion(mv) == 3)
    assertMatchesRecompute(base, mv)
    // prior MV versions still time-travel (replace commit, not erase)
    assert(Snapshots.read(spark, mv, Some(v0)).count() == 1)
  }

  test("a maintained MV serves the base rollup via MvRewrite (perturbed proof)") {
    val base = SparkHygiene.scratchDir("imv_base8")
    val mv = SparkHygiene.scratchDir("imv_mv8")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))).repartition(2, $"id"))
    IncrementalMv.initialize(spark, base, mv, spec)
    Snapshots.commit(spark, base, rows(Seq((4L, "b", 40L))))
    DeleteRows.deleteKeys(spark, base, "id", keys = Seq(1L))
    IncrementalMv.refresh(spark, base, mv, "id", spec)
    def defFor(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      graft.plans.MvRewrite.MvDef(
        factPathSuffix = Snapshots.manifestEntries(base,
          Snapshots.currentVersion(base)).head,
        mvPlan = plan, groupCols = Set("grp"), countCol = "n",
        sumCols = Map("v" -> "sum_v"), minCols = Map("v" -> "min_v"),
        maxCols = Map("v" -> "max_v"), cntCols = Map("v" -> "cnt_v"))
    def serve(): Seq[(String, Long, Long)] = {
      try Snapshots.read(spark, base).groupBy($"grp")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      finally graft.plans.MvRewrite.clear(spark)
    }
    // a PERTURBED MV visibly changes the answer → the MV is serving
    graft.plans.MvRewrite.register(spark, defFor(
      Snapshots.read(spark, mv)
        .withColumn("n", $"n" + when($"grp" === "a", 100L).otherwise(0L))
        .queryExecution.analyzed))
    assert(serve().find(_._1 == "a").get._2 == 101L,
      "perturbation invisible: the rewrite did not serve from the MV")
    // the REAL maintained MV serves the exact recompute
    graft.plans.MvRewrite.register(spark, defFor(
      Snapshots.read(spark, mv).queryExecution.analyzed))
    assert(serve() == Seq(("a", 1L, 20L), ("b", 2L, 70L)))
  }

  test("follow drains the commit feed into the MV and restarts idempotently") {
    val base = SparkHygiene.scratchDir("imv_base7")
    val mv = SparkHygiene.scratchDir("imv_mv7")
    val ck = SparkHygiene.scratchDir("imv_ck7")
    Snapshots.commit(spark, base, rows(Seq(
      (1L, "a", 10L), (2L, "b", 20L))).repartition(2, $"id"))
    IncrementalMv.initialize(spark, base, mv, spec)
    Snapshots.commit(spark, base, rows(Seq((3L, "a", 30L), (4L, "c", 5L))))
    DeleteRows.deleteKeys(spark, base, "id", keys = Seq(2L))
    IncrementalMv.follow(spark, base, mv, "id", spec, ck)
      .awaitTermination(120000)
    assert(IncrementalMv.lastBaseVersion(mv) ==
      Snapshots.currentVersion(base))
    assertMatchesRecompute(base, mv)
    val vAfter = Snapshots.currentVersion(mv)
    // restart with the same checkpoint: nothing new → no MV commit
    IncrementalMv.follow(spark, base, mv, "id", spec, ck)
      .awaitTermination(120000)
    assert(Snapshots.currentVersion(mv) == vAfter)
    // a commit landing between runs is picked up from the checkpoint
    Snapshots.commit(spark, base, rows(Seq((5L, "b", 50L))))
    IncrementalMv.follow(spark, base, mv, "id", spec, ck)
      .awaitTermination(120000)
    assertMatchesRecompute(base, mv)
  }
}
