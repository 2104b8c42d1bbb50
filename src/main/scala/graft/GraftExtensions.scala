package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Greatest, Least, Literal, Subtract}

import graft.functions.{FloatVectorDot, FloatVectorNormSq}

/** Catalyst extension point: registers the engine's native vector
  * expressions as SQL functions, so `spark.sql` text (and any BI layer
  * speaking SQL to the session) gets the same codegen'd hot path as the
  * Column API.
  *
  * Activate with `--conf spark.sql.extensions=graft.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`;
  * [[GraftExtensions.register]] injects into an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    // rewrite cartesian ε-similarity joins (crossJoin + cosine ≤ ε
    // filter) into the exact pivot-band equi-join — see
    // [[graft.plans.EpsilonJoinRewrite]]
    ext.injectOptimizerRule(_ => graft.plans.EpsilonJoinRewrite)
    // rewrite point-in-interval range joins into slot-bucketed
    // equi-joins — see [[graft.plans.RangeJoinRewrite]]
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // rewrite cartesian levenshtein ≤ k joins into the PassJoin segment
    // equi-join — see [[graft.plans.EditDistanceJoinRewrite]]
    ext.injectOptimizerRule(_ => graft.plans.EditDistanceJoinRewrite)
    // rewrite fact-scan aggregates to registered rollup MVs — see
    // [[graft.plans.MvRewrite]]
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // drop inner PK-FK joins whose parents read only fact columns —
    // see [[graft.plans.JoinElimination]]
    ext.injectOptimizerRule(_ => graft.plans.JoinElimination)
    // as-of join: marker-condition joins become the whole-operator
    // logical node, planned by the sorted-merge exec — see
    // [[graft.plans.AsOf]]
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[FloatVectorDot].getName, null, name, usage, "")

  private def unitCosineDistance(a: Expression, b: Expression): Expression =
    Least(Seq(
      Greatest(Seq(
        Subtract(Literal(1.0), FloatVectorDot(a, b)),
        Literal(0.0))),
      Literal(1.0)))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two array<float> vectors"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))),
    (FunctionIdentifier("vector_norm_sq"),
      info("vector_norm_sq", "vector_norm_sq(a) - squared L2 norm of an array<float> vector"),
      (children: Seq[Expression]) => FloatVectorNormSq(children.head)),
    (FunctionIdentifier("unit_cosine_distance"),
      info("unit_cosine_distance",
        "unit_cosine_distance(a, b) - cosine distance of unit vectors, clipped to [0,1]"),
      (children: Seq[Expression]) => unitCosineDistance(children(0), children(1))),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonicalization of a string"),
      (children: Seq[Expression]) => graft.functions.NfcNormalizeExpr(children.head)),
    (FunctionIdentifier("z_interleave"),
      info("z_interleave",
        "z_interleave(x, y) - Morton (Z-order) bit interleave of two integral columns; domain [0, 4294967295] per input (out-of-domain values error rather than scramble the curve)"),
      (children: Seq[Expression]) =>
        graft.functions.ZInterleaveExpr(children(0), children(1))),
    (FunctionIdentifier(graft.plans.AsOf.FnName),
      info(graft.plans.AsOf.FnName,
        "asof_match(lk, rk, lt, rt, tie, tolMicros) - as-of join marker condition; rewritten to the sorted-merge as-of operator (unevaluable if left in place)"),
      (children: Seq[Expression]) => graft.plans.AsOfMark(children)))

  /** SQL TABLE-VALUED FUNCTIONS over the snapshot log — the Delta SQL
    * vocabulary (`table_changes`, time travel) for users who only speak
    * SQL to the session:
    *
    * {{{
    *   SELECT * FROM table_changes('/data/t', 1, 3)
    *   SELECT * FROM snapshot_at('/data/t', 2)   -- or current: ('/t')
    * }}}
    *
    * Arguments must be literals (they select WHICH table/versions to
    * plan — they cannot be row-dependent); non-foldable arguments error
    * at analysis with a clear message.
    */
  private def lit(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal, got ${e.sql}")
    e.eval(null)
  }
  private def litStr(e: Expression, what: String): String =
    String.valueOf(lit(e, what))
  private def litInt(e: Expression, what: String): Int =
    lit(e, what) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(dir, fromVersion, toVersion, keyCol) - row-level " +
          "change feed (insert/delete/update pre+post) between two " +
          "committed snapshot versions, manifest-diff-sized"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "table_changes(dir, fromVersion, toVersion, keyCol) takes 4 arguments")
        graft.operators.ChangeFeed.changes(SparkSession.active,
            litStr(children(0), "dir"),
            litInt(children(1), "fromVersion"),
            litInt(children(2), "toVersion"),
            litStr(children(3), "keyCol"))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("snapshot_at"),
      info("snapshot_at",
        "snapshot_at(dir[, version]) - a snapshot table pinned to a " +
          "version (default: current) as a SQL relation"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty && children.length <= 2,
          "snapshot_at(dir[, version]) takes 1 or 2 arguments")
        val dir = litStr(children(0), "dir")
        val v = children.lift(1).map(litInt(_, "version"))
        graft.sources.Snapshots.read(SparkSession.active, dir, v)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("snapshot_history"),
      info("snapshot_history",
        "snapshot_history(dir) - one row per committed version: " +
          "(version, n_entries, n_columns) straight from the manifest " +
          "log, no data files opened (n_columns is -1 before any " +
          "schema was recorded)"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "snapshot_history(dir) takes 1 argument")
        val dir = litStr(children(0), "dir")
        val spark = SparkSession.active
        val cur = graft.sources.Snapshots.currentVersion(dir)
        require(cur > 0, s"no snapshots under $dir")
        // driver-side walk of the version log — O(versions) manifest
        // reads, zero data-file opens (vacuumed versions are skipped)
        val rows = (1 to cur).flatMap { v =>
          scala.util.Try(
            graft.sources.Snapshots.manifestEntries(dir, v)).toOption
            .map { entries =>
              val cols = graft.sources.Snapshots.schemaOf(dir, v)
                .map(_.length).getOrElse(-1)
              (v, entries.size, cols)
            }
        }
        import spark.implicits._
        rows.toDF("version", "n_entries", "n_columns")
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("snapshot_tags"),
      info("snapshot_tags",
        "snapshot_tags(dir) - one row per tag: (tag, version) from the " +
          "immutable tag refs; tagged versions survive vacuum and read " +
          "via VERSION AS OF 'tag'"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "snapshot_tags(dir) takes 1 argument")
        val dir = litStr(children(0), "dir")
        val spark = SparkSession.active
        import spark.implicits._
        graft.sources.Snapshots.tags(dir)
          .toDF("tag", "version").queryExecution.analyzed
      }))

  /** Register into an existing session (tests, notebooks), and apply
    * session-setup conf the engine relies on. This is the one setup
    * chokepoint every graft entry point (Bench/Verify/tests) passes
    * through — conf is set once here, up front, never mid-query
    * (ADVICE r2: `Tables.events` used to flip `nanosAsLong` as a side
    * effect of every call, racing concurrent queries).
    */
  def register(spark: SparkSession): Unit = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    // reader only accepts as raw longs; Tables.events truncates to µs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    tableFunctions.foreach { case (ident, inf, builder) =>
      spark.sessionState.tableFunctionRegistry
        .registerFunction(ident, inf, builder)
    }
    // session-injection path for the ε-join rewrite. Note: experimental
    // rules run AFTER the main optimizer batches, so the rewritten plan
    // misses a second pushdown pass — sessions built via
    // `withExtensions(new GraftExtensions)` get the rule inside the main
    // fixed-point batch instead (preferred for production).
    if (!spark.experimental.extraOptimizations.contains(graft.plans.EpsilonJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.EpsilonJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.EditDistanceJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.EditDistanceJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MvRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.JoinElimination))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.JoinElimination
    if (!spark.experimental.extraOptimizations.contains(graft.plans.AsOfJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AsOfJoinRewrite
    // runtime group filtering for DELTA-based row-level DML (the
    // WriteDelta analog of Spark's ReplaceData-only rule). This rule
    // NEEDS the post-pushdown plan, which is exactly what the
    // "User Provided Optimizers" batch sees — the extraOptimizations
    // placement is required, not a fallback, so it is registered here
    // and not in the withExtensions path (where injectOptimizerRule
    // would run pre-pushdown and never match).
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.DeltaDmlRuntimeFiltering))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.DeltaDmlRuntimeFiltering
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
