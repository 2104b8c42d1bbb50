package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Summarize, TemporalJoins}

/** Reference aggregation/window semantics (A6/A7/A10, W2, ST5) exercised
  * over the events table.
  */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PIVOT — the wide-report shape every dashboard export ships: one
    // row per day, one column per event type. Expressed as conditional
    // aggregates over the pinned type list rather than Dataset.pivot:
    // .pivot() plans TWO exchanges (a (day,type) count, then a
    // day-keyed pivotfirst), where the conditional form is one scan,
    // partial aggregation map-side, and ONE tiny day-key exchange —
    // the plan you want when the scan is 100 TB. The oracle spells the
    // identical semantics as FILTER aggregates.
    "a16_pivot" -> ((s, dir) => {
      def cnt(t: String) =
        count(when(col("event_type") === t, 1)).as(t)
      Tables.events(s, dir)
        .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .groupBy(col("day"))
        .agg(cnt("click"), cnt("error"), cnt("purchase"),
          cnt("signup"), cnt("view"))
        .orderBy(col("day"))
    }),

    // UNPIVOT — a16's inverse reshape (wide report → long form, the
    // melt every BI export round-trips): the per-day wide row of
    // a16-style conditional counts turns back into (day, measure,
    // value) rows via the codegen'd `stack` generator — a zero-shuffle
    // projection over the already-aggregated wide relation (the
    // generator multiplies ROWS, never exchanges). Completes the
    // reshape pair: pivot = conditional aggregates, unpivot = stack.
    "a21_unpivot" -> ((s, dir) => {
      def cnt(t: String) =
        count(when(col("event_type") === t, 1)).as(t)
      Tables.events(s, dir)
        .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .groupBy(col("day"))
        .agg(cnt("click"), cnt("error"), cnt("purchase"),
          cnt("signup"), cnt("view"))
        .select(col("day"), expr(
          """stack(5, 'click', click, 'error', error,
            |'purchase', purchase, 'signup', signup,
            |'view', view) AS (measure, n)""".stripMargin))
        .orderBy(col("day"), col("measure"))
    }),

    // LEAD — the forward-looking window w6's lag-based sessionize
    // doesn't cover: per-user gap to the NEXT event, with an
    // inactivity flag (gap > 1 h), null gap on each user's last event.
    // Same one-exchange shape as every per-user window here: shuffle
    // once on user_id, a single window pass, no join. The flag's
    // null-handling is pinned on both engines (IS NOT NULL AND ... —
    // FALSE, not NULL, on the last row).
    "w16_lead_gap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("gap_us"),
          (col("next_ts").isNotNull &&
            (unix_micros(col("next_ts")) - unix_micros(col("ts")) >
              3600000000L)).as("long_gap"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // SEQUENTIAL FUNNEL — the MATCH_RECOGNIZE-style ordered-pattern
    // query (view, THEN a click after it, THEN a purchase after that)
    // in ONE pass: three chained running-min columns over the same
    // (user, ts, event_id) window order — `v` = earliest view so far,
    // `c` = earliest click strictly after a preceding view, `p` =
    // earliest purchase strictly after such a click — then a per-user
    // aggregate reads the converged values. One exchange on user_id
    // serves the windows AND the aggregate (plan-pinned); no
    // self-joins, no per-step passes over the events — the shape that
    // matters when events are 100 TB and the naive funnel is 3 joins
    // of the full stream. The running-min chaining is provably equal
    // to the step-by-step scalar definition (each step's running
    // column has converged to its final value at every row the next
    // step's condition examines), which is what the oracle computes.
    "w24_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("v",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("ts") > col("v"),
            col("ts"))).over(w))
        .withColumn("p",
          min(when(col("event_type") === "purchase" && col("ts") > col("c"),
            col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(min(col("v")).as("view_ts"), min(col("c")).as("click_ts"),
          min(col("p")).as("purchase_ts"))
        .select(col("user_id"), col("view_ts"), col("click_ts"),
          col("purchase_ts"),
          when(col("purchase_ts").isNotNull, 3)
            .when(col("click_ts").isNotNull, 2)
            .when(col("view_ts").isNotNull, 1)
            .otherwise(0).as("steps"))
        .orderBy(col("user_id"))
    }),

    // W25: w24's funnel run THROUGH Structured Streaming with a
    // per-step event-time TIMEOUT (streaming/FunnelStream) — the
    // MATCH_RECOGNIZE-with-timeout shape batch cannot express:
    // abandonment ("viewed, never clicked within 30 min") is decided
    // by the WATERMARK passing the deadline, purchase conversion by
    // the event itself; attempts restart after finalization. Events
    // fold through the machine in strict (ts, event_id) order via the
    // watermark-released state buffer, so arrival interleaving is
    // invisible. The oracle replays the identical machine with a
    // recursive CTE (one recursion step per event, timeout checked
    // before each transition) — streaming state machine ≡ sequential
    // replay, hash-exact below the w20-style emission cutoff.
    "w25_stream_funnel" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      import s.implicits._
      val ev = Tables.eventsStream(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .as[graft.streaming.FunnelStream.Ev]
      val funnel = graft.streaming.FunnelStream.funnel(
        ev, timeoutSec = 1800L, watermarkDelay = "30 minutes")
      val out = SparkHygiene.scratchDir("w25_out")
      val ck = SparkHygiene.scratchDir("w25_ck")
      val q = funnel.toDF.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the w20 emission-cutoff discipline, in epoch micros: outcomes
      // ending within (delay + slack) of max event time sit in the
      // band where emission is engine-internal — excluded identically
      // on both sides
      val cut = Tables.events(s, dir).agg(
        (unix_micros(max(col("ts"))) - lit(1810000000L)).as("cut_us"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("end_us") < col("cut_us"))
        .select(col("user_id"), col("attempt"), col("outcome"),
          col("steps"), col("start_us"), col("end_us"))
        .orderBy(col("user_id"), col("attempt"))
    }),

    // W26: j7's backward as-of join run THROUGH Structured Streaming
    // (streaming/AsofStream) — the event-time TEMPORAL join (Flink's
    // temporal table join): each purchase enriched with the latest
    // click at or before it, per user. A purchase finalizes only when
    // the watermark passes it (an earlier click can arrive until
    // then); both sides fold through the watermark-released buffer in
    // the batch operator's exact (ts, kind, id) order. The oracle is
    // j7's union+running-last SQL restricted to purchases below the
    // emission cutoff: streaming temporal join ≡ batch as-of,
    // hash-exact through a real streaming execution.
    "w26_stream_asof" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      import s.implicits._
      val ev = Tables.eventsStream(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("kind"),
          when(col("event_type") === "click", col("value"))
            .otherwise(lit(0.0)).as("value"))
        .as[graft.streaming.AsofStream.Ev]
      val joined = graft.streaming.AsofStream.asof(ev,
        watermarkDelay = "30 minutes")
      val out = SparkHygiene.scratchDir("w26_out")
      val ck = SparkHygiene.scratchDir("w26_ck")
      val q = joined.toDF.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the watermark rides the FILTERED stream (click/purchase only),
      // so the emission cutoff derives from the same filtered max —
      // cutting against the all-events max would claim rows the
      // watermark never released
      val cut = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .agg((unix_micros(max(col("ts"))) - lit(1810000000L)).as("cut_us"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("left_us") < col("cut_us"))
        .select(col("left_id").as("purchase_id"), col("user_id"),
          col("right_id").as("click_id"),
          round(col("right_value"), 2).as("click_value"))
        .orderBy(col("purchase_id"))
    }),

    // W27: per-window TOP-K through real streaming (streaming/
    // TopKStream) — the live leaderboard native streaming cannot
    // express (a rank over a streaming aggregate is neither computable
    // nor retractable in append mode): per-hour event-type counts
    // accumulate in window-keyed state and the RANKED top-3 emits
    // exactly once when the watermark closes the window. Deterministic
    // (count desc, category asc) ties make the close oracle-replayable:
    // the oracle is the batch count + rank under the w20-style cutoff.
    "w27_stream_topk" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      import s.implicits._
      val ev = Tables.eventsStream(s, dir)
        .select(
          expr("unix_micros(ts) div 3600000000 * 3600000000").as("win_us"),
          col("event_type").as("category"), col("ts"))
        .as[graft.streaming.TopKStream.Ev]
      val top = graft.streaming.TopKStream.topK(
        ev, windowSec = 3600L, k = 3, watermarkDelay = "30 minutes")
      val out = SparkHygiene.scratchDir("w27_out")
      val ck = SparkHygiene.scratchDir("w27_ck")
      val q = top.toDF.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (unix_micros(max(col("ts"))) - lit(1810000000L)).as("cut_us"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("win_us") + lit(3600000000L) < col("cut_us"))
        .select(col("win_us"), col("category"), col("n"), col("rk"))
        .orderBy(col("win_us"), col("rk"))
    }),

    // W28: w14's daily-distinct KMV sketch through REAL streaming
    // (streaming/SketchStream) — per-day state is the 32 smallest
    // distinct user-hash values (k·8 bytes regardless of traffic,
    // folded by the batch aggregator's own reduce), the estimate
    // emitted exactly once at watermark close. Completes the triangle:
    // t19/w14 prove the sketch batch-side, q30 proves its merge
    // algebra, w28 proves the streaming close — all against the same
    // bit-replayable oracle.
    "w28_stream_distinct" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      import s.implicits._
      val h = conv(substring(
          md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 15),
        16, 10).cast("long")
      val ev = Tables.eventsStream(s, dir)
        .select(unix_micros(date_trunc("DAY", col("ts"))).as("win_us"),
          h.as("h"), col("ts"))
        .as[graft.streaming.SketchStream.Ev]
      val est = graft.streaming.SketchStream.kmvDistinct(
        ev, windowSec = 86400L, k = 32, watermarkDelay = "30 minutes")
      val out = SparkHygiene.scratchDir("w28_out")
      val ck = SparkHygiene.scratchDir("w28_ck")
      val q = est.toDF.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (unix_micros(max(col("ts"))) - lit(1810000000L)).as("cut_us"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("win_us") + lit(86400000000L) < col("cut_us"))
        .select(col("win_us"), col("n_sketch"), col("est_distinct"))
        .orderBy(col("win_us"))
    }),

    // Semi-structured extraction — the JSON-payload column every event
    // pipeline carries. from_json with an explicit schema (codegen'd,
    // vectorizable) pulls the typed field out ONCE in the scan
    // projection; the aggregate then runs on a plain int column. At
    // scale the lesson is schema-on-read done right: no regex, no
    // per-row UDF, no second pass — and a malformed payload degrades
    // to NULL (PERMISSIVE), counted separately here (n_bad) instead of
    // killing the job. Oracle replays via DuckDB's JSON extraction.
    "p14_json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("k").isNull, 1)).as("n_bad"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k").cast("long")).as("sum_k"))
        .orderBy(col("event_type"))),

    // Ranking-function breadth in ONE report: row_number (already used
    // as a tool elsewhere) alongside ntile / percent_rank / cume_dist —
    // the quartile/percentile spend-report shape analytics exports
    // ship. Per-(type,user) totals aggregate first (decimal sums, one
    // exchange), then a single window pass per event_type computes all
    // four functions together — Spark plans ONE Window operator with
    // one sort, not four. The window ORDER BY is total-then-user so
    // every rank is deterministic (no peer ties ⇒ percent_rank and
    // cume_dist are the exact rationals (rn−1)/(n−1) and rn/n — single
    // exactly-rounded double divisions, portable bit-for-bit).
    "w17_rank_report" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("total_value").desc, col("user_id").asc)
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(round(sum(col("value").cast("decimal(18,6)")), 4)
          .cast("double").as("total_value"))
        .select(col("event_type"), col("user_id"), col("total_value"),
          row_number().over(w).as("rn"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("event_type"), col("rn"))
    }),

    // Ordered string aggregation (LISTAGG / string_agg — the report
    // export op): per user, the chronological event-type sequence as
    // one string. collect_list order is partition-arrival-dependent
    // after a shuffle, so the PORTABLE form collects (ts, id, type)
    // structs, array_sorts them (deterministic total order), and maps
    // to the type field before joining — bit-identical to DuckDB's
    // string_agg(... ORDER BY ts, id) on any partitioning. Per-group
    // state is the group's events (bounded by the per-user event
    // count); the sequence string is the REPORT, not an exchange key.
    "a18_string_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type"))).as("seq"))
        .orderBy(col("user_id"))),

    // Explicit GROUPING SETS — the hand-picked set list neither ROLLUP
    // (a11) nor CUBE (a15) expresses: exactly ((type, day), (type),
    // (day)) with NO grand-total row. Same single-scan map-side
    // expansion + one exchange; grouping_id() disambiguates. Completes
    // the multi-level aggregation trio.
    "a17_grouping_sets" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .createOrReplaceTempView("__g_events_td")
      s.sql(
        """SELECT event_type, day, grouping_id() AS lvl, count(*) AS n
          |FROM __g_events_td
          |GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
          |ORDER BY lvl, event_type, day""".stripMargin)
    }),

    // TPC-H Q21-shaped DOUBLE correlation — EXISTS and NOT EXISTS
    // against the same fact, both with two-table range predicates
    // (q4 has the single EXISTS): error events that saw a click within
    // 10 min (the user was active) but NO purchase within 30 min (the
    // recovery never happened) — the funnel/alerting compound every
    // incident pipeline ships. Plans as a left-semi then a left-anti
    // hash join on the user key, each range condition riding its join
    // as a residual; at scale that is two key-partitioned hash joins,
    // never a per-row subquery.
    "j13_semi_anti_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
      errs
        .join(clicks, col("user_id") === col("cu") &&
          col("cts") > col("ts") &&
          col("cts") <= col("ts") + expr("INTERVAL 10 MINUTES"), "left_semi")
        .join(purch, col("user_id") === col("pu") &&
          col("pts") > col("ts") &&
          col("pts") <= col("ts") + expr("INTERVAL 30 MINUTES"), "left_anti")
        .select(col("user_id"), col("error_id"))
        .orderBy(col("user_id"), col("error_id"))
    }),

    // A6 most-common with deterministic tie-break
    "a6_mode" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type").asc)
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("top_type"), col("cnt"))
        .orderBy(col("user_id"))
    }),

    // Running DISTINCT-user count per (event_type, day) via the
    // FIRST-TOUCH trick: a naive running COUNT(DISTINCT) window
    // re-scans every prior day's users per day (quadratic, and Spark
    // refuses DISTINCT aggregates over running frames anyway); instead
    // each (user, type) collapses to its first-seen day (one
    // corpus-linear shuffle), the days roll up (tiny shuffle), and the
    // running sum walks #days rows per type — window state bounded by
    // the CALENDAR × type cardinality, not the corpus. The standard
    // growth-accounting query every telemetry pipeline ships.
    "a13_cum_distinct" -> ((s, dir) => {
      val firstDay = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(to_date(col("ts"))).as("day"))
      val daily = firstDay.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("new_users"), col("cum_users"))
        .orderBy(col("event_type"), col("day"))
    }),

    // A7 earliest/latest rendered
    "a7_date_range" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("earliest"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("latest"))
        .orderBy(col("user_id"))),

    // W2 chronological top-3 per user
    "w2_chrono_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("user_id"), col("rk"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"), col("rk"))
    }),

    // A10/W1/W4 top-10 histogram, deterministic tie-break
    "a10_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(10)),

    // ST5 trigger predicate truth table (T=18 gives a fired/not mix on
    // the 49..86 events-per-user distribution)
    "st5_trigger" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("sc", (col("user_id") % 4).cast("int"))
        .withColumn("fired", Summarize.shouldSummarize(col("n"), col("sc"), 18))
        .select(col("user_id"), col("n"), col("sc"), col("fired"))
        .orderBy(col("user_id"))),

    // backward as-of join: each purchase ← the latest prior click by the
    // same user (inclusive). Union+running-last plan: one shuffle on
    // user_id, no range join. 143/1981 purchases have no prior click at
    // sf0.01 (null asof columns) — the outer branch is exercised.
    // Gap-based sessionization (30-min inactivity cut per user): one
    // shuffle on the key, one window pass (lag + running break-sum),
    // one roll-up — the event-telemetry shape every training-data
    // pipeline ends up needing
    "w6_sessionize" -> ((s, dir) =>
      graft.operators.Sessionize.stats(Tables.events(s, dir),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        valueCol = "value", gapSec = 1800L)
        .orderBy(col("user_id"), col("session_idx"))),

    // Spark's NATIVE session_window operator — the built-in session
    // aggregation w6's lag-based Sessionize formulates by hand. One
    // groupBy((user, session_window)) pass: Spark merges overlapping
    // [ts, ts+gap) intervals per key inside the aggregate (map-side
    // partial merge, one user-key exchange — no window-function sort
    // pass at all, unlike w6's lag+running-sum). Session end is
    // last_ts + gap by definition; the oracle replays with the w6
    // gap-break technique and emits the identical bounds. Counts and
    // decimal value sums per session, keyed deterministically by the
    // session start.
    "w19_native_session" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("total_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("s_start"))),

    // HOPPING (sliding) event-time windows — the overlapping-window
    // variant w8's tumbling roll-up can't express: 1-hour windows
    // every 30 minutes, so each event lands in exactly TWO windows and
    // trend dashboards get half-period refresh with full-period
    // context. Spark's window(ts, size, slide) expands the assignment
    // map-side (a 2× row multiply BEFORE the aggregate's partial
    // combine — the exchange still carries only per-(window, type)
    // partials, never 2× the events). Oracle replays the two-window
    // assignment arithmetic on epoch seconds.
    "w21_hopping_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // W22: the hopping-window aggregate THROUGH Structured Streaming —
    // overlapping windows are the interesting streaming case because
    // each event updates TWO window states and append-mode emission
    // still fires per window exactly once (watermark past window end).
    // Cutoff discipline as w20: both sides keep windows whose END is
    // strictly below max event time − delay − slack.
    "w22_stream_hopping" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val agg = Tables.eventsStream(s, dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("total_value"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"), col("total_value"))
      val out = SparkHygiene.scratchDir("w22_out")
      val ck = SparkHygiene.scratchDir("w22_ck")
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (max(col("ts")) - expr("INTERVAL 30 MINUTES")
          - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("we") < col("cut"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // W20: w19's native session aggregation run THROUGH Structured
    // Streaming — watermarked session_window in append mode, drained
    // with AvailableNow and read back. A session emits exactly once,
    // when the watermark passes its end (sessions still open at end of
    // stream never emit), so BOTH sides filter to sessions strictly
    // below the data-derived cutoff (max event time − delay − 10 s
    // slack, the w9_outer discipline — the boundary band where
    // emission is engine-internal is excluded identically). Completes
    // the streaming oracle family: inner/outer/semi joins, dedup, and
    // now sessions — all hash-green through real streaming execution.
    "w20_stream_session" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val agg = Tables.eventsStream(s, dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("total_value"))
        .select(col("user_id"), col("sw.start").as("ss"),
          col("sw.end").as("se"), col("n_events"), col("total_value"))
      val out = SparkHygiene.scratchDir("w20_out")
      val ck = SparkHygiene.scratchDir("w20_ck")
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (max(col("ts")) - expr("INTERVAL 30 MINUTES")
          - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("se") < col("cut"))
        .select(col("user_id"),
          date_format(col("ss"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          date_format(col("se"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("s_start"))
    }),

    // W23: j17's SCD2 history build run INCREMENTALLY through
    // Structured Streaming — flatMapGroupsWithState carries the one
    // open version per key (bytes of state, regardless of history
    // length) and emits each version exactly once, the moment the
    // event that closes it arrives. The oracle is the BATCH operator's
    // closed rows (valid_to IS NOT NULL): streaming incremental
    // maintenance must equal batch recompute, hash-exact, through a
    // real streaming execution (AvailableNow → parquet sink → read
    // back). Open versions live only in state and never emit — the
    // same never-retract discipline as w20's sessions.
    "w23_stream_scd2" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      import s.implicits._
      val ev = Tables.eventsStream(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .as[graft.streaming.StreamScd2.Ev]
      val closed = graft.streaming.StreamScd2.closedIntervals(ev)
      val out = SparkHygiene.scratchDir("w23_out")
      val ck = SparkHygiene.scratchDir("w23_ck")
      val q = closed.toDF.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    "j7_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value"))
      TemporalJoins.asofBackward(purchases, clicks,
        keyCol = "user_id", tsCol = "ts",
        leftIdCol = "purchase_id", rightIdCol = "click_id",
        payloadCols = Seq("click_id", "value"))
        .select(col("purchase_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          round(col("asof_value"), 2).as("click_value"))
        .orderBy(col("purchase_id"))
    }),

    // FORWARD as-of join — j7's mirror ("next click at/after each
    // purchase": time-to-next-activity / forward attribution). Same
    // union+running-last plan, traversal over reversed time;
    // purchases with no following click keep null columns (the
    // outer branch is exercised at every SF).
    "j11_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value"))
      TemporalJoins.asofForward(purchases, clicks,
        keyCol = "user_id", tsCol = "ts",
        leftIdCol = "purchase_id", rightIdCol = "click_id",
        payloadCols = Seq("click_id", "value"))
        .select(col("purchase_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          round(col("asof_value"), 2).as("click_value"))
        .orderBy(col("purchase_id"))
    }),

    // interval-containment join: clicks falling inside 10-minute incident
    // windows opened by error events. Slot-bucketed equi-join (slot width
    // = window length ⇒ ≤ 2 index rows per interval) + exact residual
    // filter — never a BroadcastNestedLoopJoin.
    "j8_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))
      TemporalJoins.intervalJoin(incidents, clicks,
        startCol = "win_start", endCol = "win_end", tsCol = "ts",
        slotWidthSec = 600L)
        .select(col("error_id"), col("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("win_start"))).as("gap_us"))
        .orderBy(col("error_id"), col("click_id"))
    }),

    // the SAME interval join written the naive way (crossJoin + range
    // filter) — a BroadcastNestedLoopJoin as authored; RangeJoinRewrite
    // turns it into the slot equi-join at optimization time. Oracle
    // equality with j8 proves the rewrite end-to-end (RangeJoinRewriteSpec
    // asserts the plan shape).
    "j9_range_rewrite" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))
      incidents.crossJoin(clicks)
        .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
        .select(col("error_id"), col("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("win_start"))).as("gap_us"))
        .orderBy(col("error_id"), col("click_id"))
    }),

    // W7 bounded sliding frame: per-user 7-row rolling sum/mean of
    // `value` (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) — the running-
    // metric shape event telemetry needs that w6's gap-sessionize and
    // the unbounded running forms don't cover. One shuffle on user_id,
    // then a single streaming frame pass per partition: no self-join,
    // no explode, state bounded by the frame width. DuckDB evaluates
    // sliding sums with a segment tree (different addition order), so
    // both sides sum in decimal per the portable-aggregation convention.
    // W8 event-time hourly window roll-up — the BATCH form of
    // streaming/EventTimeAgg (one definition serves both modes; the
    // streaming form adds the watermark and is spec-tested for
    // late-data drop + batch convergence). Spark's window() aligns to
    // the epoch, so DuckDB's date_trunc('hour') labels identically.
    "w8_hourly_window" -> ((s, dir) =>
      graft.streaming.EventTimeAgg.hourly(Tables.events(s, dir))
        .orderBy(col("win_start"), col("event_type"))),

    // W9 the j8 interval join run THROUGH Structured Streaming: two file
    // streams over the same events source, watermarked, slot-bucketed
    // stream-stream equi-join (IntervalStreamJoin), drained to completion
    // with Trigger.AvailableNow into a parquet sink and read back. The
    // oracle is j8's SQL verbatim — the stream result must equal the
    // batch join row-for-row, which makes this the first STREAMING
    // execution with a hash-green DuckDB row (the other ST rows gate the
    // batch forms; stream semantics were spec-only until here).
    "w9_stream_join" -> ((s0, dir) => {
      // state partitions sized to the corpus (see streamStateSession)
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))
      val joined = graft.streaming.IntervalStreamJoin.join(
          incidents, clicks,
          startCol = "win_start", endCol = "win_end", tsCol = "ts",
          slotWidthSec = 600L, maxLenSec = 600L, delay = "30 minutes")
        .select(col("error_id"), col("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("win_start"))).as("gap_us"))
      // NOTE: constructing this DataFrame RUNS the streaming job (the
      // sink drain is what's under test); explain-only callers pay it
      // too. Scratch dirs are reaped by a shutdown hook (SparkHygiene).
      val out = SparkHygiene.scratchDir("w9_out")
      val ck = SparkHygiene.scratchDir("w9_ck")
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).orderBy(col("error_id"), col("click_id"))
    }),

    // W18: stream-stream LEFT SEMI join — the streaming form of j13's
    // EXISTS half ("error events that saw a click within 10 minutes"),
    // run through real Structured Streaming and drained to parquet.
    // Distinct from w9's inner join in both semantics and state
    // lifecycle: each left row emits AT MOST ONCE (first match), and
    // the engine must hold an un-matched left row in state only until
    // the watermark passes its match horizon — the native left-semi
    // stream join does exactly that with the time-range condition
    // riding the user-key equi-join. State is bounded by
    // watermark + 10 min horizon per user key. The oracle is the batch
    // EXISTS verbatim: the drained stream must converge to it
    // row-for-row.
    "w18_stream_semi" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"), col("ts"))
        .withWatermark("ts", "30 minutes")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
        .withWatermark("cts", "30 minutes")
      val joined = errs.join(clicks,
        col("user_id") === col("cu") &&
          col("cts") > col("ts") &&
          col("cts") <= col("ts") + expr("INTERVAL 10 MINUTES"),
        "left_semi")
        .select(col("user_id"), col("error_id"))
      val out = SparkHygiene.scratchDir("w18_out")
      val ck = SparkHygiene.scratchDir("w18_ck")
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).orderBy(col("user_id"), col("error_id"))
    }),

    // W9-OUTER: the left_outer form of the stream-stream interval join —
    // incident windows with NO activity emit once, null-padded, after
    // the watermark passes their match horizon (the alerting shape:
    // "error windows that saw zero clicks"). Outer rows are per
    // (interval, slot) — see IntervalStreamJoin's doc. The oracle is the
    // batch per-slot left join; BOTH sides filter null rows to intervals
    // strictly below a data-derived watermark cutoff (max event time −
    // delay − interval length − 10 s slack), because a streaming outer
    // join can only emit nulls the final watermark has passed — the
    // slack absorbs the engine's ms truncation so the boundary band,
    // where emission is engine-internal, is excluded identically on
    // both sides.
    "w9_stream_join_outer" -> ((s0, dir) => {
      // state partitions sized to the corpus (see streamStateSession)
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))
      val joined = graft.streaming.IntervalStreamJoin.join(
          incidents, clicks,
          startCol = "win_start", endCol = "win_end", tsCol = "ts",
          slotWidthSec = 600L, maxLenSec = 600L, delay = "30 minutes",
          joinType = "left_outer")
        .select(col("error_id"), col("win_start"), col("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("win_start"))).as("gap_us"))
      val out = SparkHygiene.scratchDir("w9o_out")
      val ck = SparkHygiene.scratchDir("w9o_ck")
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (least(max(when(col("event_type") === "error", col("ts"))),
               max(when(col("event_type") === "click", col("ts"))))
          - expr("INTERVAL 30 MINUTES") - expr("INTERVAL 10 MINUTES")
          - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("click_id").isNotNull || col("win_start") < col("cut"))
        .select(col("error_id"),
          date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("click_id"), col("gap_us"))
        .orderBy(col("error_id"), col("click_id"))
    }),

    // W15: the FULL OUTER form of the stream-stream interval join —
    // w9_outer's incident-without-activity nulls PLUS the symmetric
    // activity-without-incident nulls (clicks inside no error window),
    // in one streaming pass. A click has exactly one slot, so its null
    // row means "matched nowhere". Emission gating: interval-side nulls
    // need the watermark past the window's match horizon (w9_outer's
    // cutoff); point-side nulls need it past the click's own timestamp
    // (no interval with start ≤ ts can still arrive) — both sides of
    // the oracle and the read-back exclude the boundary band where
    // emission is engine-internal, each with its OWN cutoff.
    "w15_stream_join_full" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))
      val joined = graft.streaming.IntervalStreamJoin.join(
          incidents, clicks,
          startCol = "win_start", endCol = "win_end", tsCol = "ts",
          slotWidthSec = 600L, maxLenSec = 600L, delay = "30 minutes",
          joinType = "full_outer")
        .select(col("error_id"), col("win_start"), col("click_id"), col("ts"),
          (unix_micros(col("ts")) - unix_micros(col("win_start"))).as("gap_us"))
      val out = SparkHygiene.scratchDir("w15_out")
      val ck = SparkHygiene.scratchDir("w15_ck")
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (least(max(when(col("event_type") === "error", col("ts"))),
               max(when(col("event_type") === "click", col("ts"))))
          - expr("INTERVAL 30 MINUTES") - expr("INTERVAL 10 MINUTES")
          - expr("INTERVAL 10 SECONDS")).as("cut_i"),
        (least(max(when(col("event_type") === "error", col("ts"))),
               max(when(col("event_type") === "click", col("ts"))))
          - expr("INTERVAL 30 MINUTES")
          - expr("INTERVAL 10 SECONDS")).as("cut_p"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(
          (col("error_id").isNotNull && col("click_id").isNotNull) ||
          (col("click_id").isNull && col("win_start") < col("cut_i")) ||
          (col("error_id").isNull && col("ts") < col("cut_p")))
        .select(col("error_id"),
          date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("click_id"), col("gap_us"))
        .orderBy(col("error_id"), col("click_id"))
    }),

    // W29: THREE-WAY stream-stream correlation (VERDICT r11 #8 — the
    // multi-stream gap): click → error within 360 min → purchase within
    // 360 min of the error, all per user, as TWO CHAINED native
    // stream-stream inner joins (the multi-stateful-operator pipeline
    // Spark 3.4+ unlocked). Each join rides the user-key equi-join
    // with a watermark-analyzable time-range residual, so each pair
    // has its own state budget: state₁ ∝ horizon(click, error), then
    // the joined (click, error) rows enter join₂ against purchases
    // with state₂ ∝ horizon(error, purchase) — never a 3-way product,
    // never stream-length state (StreamScaleProbe's w29 row measures
    // it). Inner semantics ⇒ the drained stream converges to the batch
    // 3-way join exactly; the oracle is that batch join verbatim.
    // NOTE on watermark vs range (ADVICE r12, MEASURED in
    // WatermarkBoundarySpec per VERDICT r13 #4): the 30-min watermark
    // is SMALLER than the 360-min join range, so under a multi-batch
    // source with cross-batch disorder a late row is dropped at input
    // and its match is lost; the exact-convergence claim is tied to
    // the AvailableNow single-drain harness here (one batch, no
    // cross-batch disorder). The spec pins both sides of the boundary:
    // delay < disorder bound loses exactly the late rows, delay ≥ the
    // bound restores batch parity. Production sizing: the delay must
    // cover the SOURCE's out-of-order bound (the range only sizes
    // state retention).
    "w29_stream_join_3way" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
        .withWatermark("cts", "30 minutes")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("error_id"),
          col("ts").as("ets"))
        .withWatermark("ets", "30 minutes")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
        .withWatermark("pts", "30 minutes")
      // a stream side may carry at most ONE event-time column into the
      // next stateful operator: demote the click time to a plain long
      // right after join₁ — `ets` stays the side's event-time column
      // (it drives join₂'s range condition and state eviction), the
      // click instant survives as data for the span arithmetic
      val ce = clicks.join(errors,
        col("user_id") === col("eu") &&
          col("ets") > col("cts") &&
          col("ets") <= col("cts") + expr("INTERVAL 360 MINUTES"))
        .select(col("user_id"), col("click_id"), col("error_id"),
          unix_micros(col("cts")).as("cus"), col("ets"))
      val cep = ce.join(purchases,
        col("user_id") === col("pu") &&
          col("pts") > col("ets") &&
          col("pts") <= col("ets") + expr("INTERVAL 360 MINUTES"))
        .select(col("user_id"), col("click_id"), col("error_id"),
          col("purchase_id"),
          (unix_micros(col("pts")) - col("cus")).as("span_us"))
      val out = SparkHygiene.scratchDir("w29_out")
      val ck = SparkHygiene.scratchDir("w29_ck")
      val q = cep.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .orderBy(col("click_id"), col("error_id"), col("purchase_id"))
    }),

    // W30: LEFT-OUTER hop in the chained multi-stateful pipeline
    // (VERDICT r12 #6 — w29 is inner-only): clicks ⟕ errors (user-key
    // equi-join, error within 360 min) feeding a SECOND stateful
    // operator — an hourly windowed aggregation splitting clicks by
    // error-presence. The property under test: an unmatched click's
    // NULL row is emitted only when the watermark passes its join
    // horizon, and that deferred emission must still land in the right
    // window of the downstream aggregate — Spark delays the agg's
    // eviction watermark by the join's state horizon, so a window
    // closes only after every one of its clicks has either matched or
    // been evicted-and-emitted. The left side keeps `cts` as its ONE
    // event-time column through the join (ets is dropped — w29's
    // constraint, opposite resolution). Both sides filter to windows
    // whose end is strictly below max-event-time − delay − join
    // horizon − 10 s: below that cut the engine has provably emitted
    // complete windows, so the drained stream equals the batch
    // left-join aggregate exactly; the oracle is that batch aggregate.
    // TIME-SERIES GAP FILL + FORWARD FILL — the resample step every
    // metrics/feature pipeline runs before modeling: per-user daily
    // rollup, missing days materialized, last observation carried
    // forward. Shape matters at 100 TB: the ONLY corpus-sized operation
    // is the first (user, day) partial-aggregated rollup; span
    // detection, the per-user `sequence()` day explosion, the fill
    // join, and the carry-forward window all run over the rollup's
    // bounded output (users × days), and the final window rides the
    // same user_id partitioning. No driver loops, no calendar table —
    // the day range derives per key, inside the plan.
    "w34_gapfill" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          // decimal-summed for order independence (portable-agg
          // convention), surfaced as double
          sum(col("value").cast("decimal(38,12)")).cast("double")
            .as("day_value"),
          count(lit(1)).as("n_events"))
      val spans = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val allDays = spans.select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      allDays.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          round(last(col("day_value"), ignoreNulls = true).over(w), 6)
            .as("filled_value"),
          col("day_value").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("day"))
    }),

    "w30_stream_outer_agg" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
        .withWatermark("cts", "30 minutes")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("error_id"),
          col("ts").as("ets"))
        .withWatermark("ets", "30 minutes")
      val joined = clicks.join(errors,
          col("user_id") === col("eu") &&
            col("ets") > col("cts") &&
            col("ets") <= col("cts") + expr("INTERVAL 360 MINUTES"),
          "left_outer")
        .select(col("cts"), col("error_id"))
      val agg = joined
        .groupBy(window(col("cts"), "1 hour"),
          col("error_id").isNotNull.cast("int").as("has_error"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("has_error"), col("n"))
      val out = SparkHygiene.scratchDir("w30_out")
      val ck = SparkHygiene.scratchDir("w30_ck")
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // cut from the FILTERED streams' max event times (they drive the
      // watermark), minus delay, minus join₁'s 360-min state horizon
      // (the downstream agg's eviction watermark is delayed by it),
      // minus the 10 s engine-boundary slack
      val cut = Tables.events(s, dir).agg(
        (least(max(when(col("event_type") === "click", col("ts"))),
               max(when(col("event_type") === "error", col("ts"))))
          - expr("INTERVAL 30 MINUTES") - expr("INTERVAL 360 MINUTES")
          - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("we") < col("cut"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("has_error"), col("n"))
        .orderBy(col("win_start"), col("has_error"))
    }),

    // W31: chained WINDOWED AGGREGATIONS — the third multi-stateful
    // chaining shape (w29 = join→join, w30 = join→agg, this = agg→agg):
    // hourly per-type counts re-aggregated into a daily rollup, the
    // classic streaming-rollup cascade (emit fine-grained early, coarse
    // later, ONE pipeline). The second aggregate keys on
    // window_time(window) — the event-time column a windowed result
    // carries — and its eviction watermark is delayed by the first
    // window's size, so a daily row emits only when every hourly slice
    // beneath it is final. n_hours counts the slices that fed each
    // daily row — a multiplicity proof the flat sum alone wouldn't
    // give. Cut: max event time − delay − 1 h (upstream window) − 10 s;
    // the oracle is the batch two-level rollup below the same cut.
    "w31_stream_agg_chain" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val hourly = Tables.eventsStream(s, dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_h"))
      val daily = hourly
        .groupBy(window(window_time(col("window")), "1 day"),
          col("event_type"))
        .agg(sum(col("n_h")).as("n"), count(lit(1)).as("n_hours"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"), col("n_hours"))
      val out = SparkHygiene.scratchDir("w31_out")
      val ck = SparkHygiene.scratchDir("w31_ck")
      val q = daily.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (max(col("ts")) - expr("INTERVAL 30 MINUTES")
          - expr("INTERVAL 1 HOUR") - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("we") < col("cut"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("n_hours"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // W32: THREE chained stateful operators — exactly-once dedup under
    // 2× delivery (w10's state store) feeding the hourly aggregation
    // feeding the daily rollup (w31's cascade): the full
    // at-least-once-queue → clean-rollup pipeline in ONE streaming
    // query, the deepest operator chain in the catalog. Dedup is a
    // passthrough for event times (it drops rows, never delays them),
    // so the downstream cut is exactly w31's: max event time − delay −
    // the hourly window − 10 s. The oracle is DISTINCT then the batch
    // two-level rollup — redelivery and chaining must both be
    // invisible below the cut.
    "w32_stream_dedup_rollup" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val once = Tables.eventsStream(s, dir)
        .select(col("event_id"), col("ts"), col("event_type"))
      val twice = once.unionByName(
        Tables.eventsStream(s, dir)
          .select(col("event_id"), col("ts"), col("event_type")))
      val daily = twice
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("event_id", "event_type")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_h"))
        .groupBy(window(window_time(col("window")), "1 day"),
          col("event_type"))
        .agg(sum(col("n_h")).as("n"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"))
      val out = SparkHygiene.scratchDir("w32_out")
      val ck = SparkHygiene.scratchDir("w32_ck")
      val q = daily.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = Tables.events(s, dir).agg(
        (max(col("ts")) - expr("INTERVAL 30 MINUTES")
          - expr("INTERVAL 1 HOUR") - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("we") < col("cut"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // STREAMING FROM A SNAPSHOT TABLE (sources/v2) — the engine's
    // tables as Structured Streaming SOURCES: three commits build the
    // table, `readStream.format("graft_snapshots")` drains it with
    // manifest-VERSION offsets (maxVersionsPerTrigger=1 forces one
    // micro-batch per commit — the incremental path, not one bulk
    // read), and each batch plans exactly the files its commit added
    // (the manifest diff), never the table. Timestamps ride through
    // the record-API reader (INT96-normalized). SnapshotsV2Spec pins
    // the checkpoint-restart and non-append-refusal contracts; the
    // oracle is the full table — a lossless drain is logically
    // invisible.
    // CONTINUOUS MV MAINTENANCE — q40's refresh driven by the STREAM:
    // IncrementalMv.follow subscribes to the base table's commit feed
    // (the V2 connector's version-offset stream, checkpointed), and
    // folds every arriving commit into the materialized rollup; the
    // erase commit rides ignoreChanges (refresh reads the manifest
    // diff, not the replayed rows). After the AvailableNow drain the
    // MV must equal the rollup recomputed from the final base state —
    // the oracle. At 100 TB this is the serving-layer aggregate that
    // never recomputes and never lags more than a trigger.
    "w37_stream_mv" -> ((s, dir) => {
      val base = SparkHygiene.scratchDir("w37_base")
      val mv = SparkHygiene.scratchDir("w37_mv")
      val ck = SparkHygiene.scratchDir("w37_ck")
      // micro-unit longs: exact signed-mergeable sums with no float
      // drift anywhere, and a type the V2 record reader serves
      // (decimal(18,6)·1e6 is integral, so the long cast is exact)
      val ev = Tables.events(s, dir).select(col("event_id"),
        col("event_type"),
        (col("value").cast("decimal(18,6)") * lit(1000000))
          .cast("long").as("v"))
      graft.sources.Snapshots.commit(s, base,
        ev.filter(col("event_id") < 3000).repartition(4, col("event_id")))
      val mvSpec = graft.operators.IncrementalMv.MvSpec(
        groupCols = Seq("event_type"), sumCols = Seq("v"),
        minMaxCols = Seq("v"))
      graft.operators.IncrementalMv.initialize(s, base, mv, mvSpec)
      graft.sources.Snapshots.commit(s, base,
        ev.filter(col("event_id") >= 3000 && col("event_id") < 5000))
      graft.operators.DeleteRows.deleteKeys(s, base, "event_id",
        keys = Seq(7L, 1203L, 2048L, 3333L, 4999L))
      val q = graft.operators.IncrementalMv.follow(
        s, base, mv, "event_id", mvSpec, ck)
      q.awaitTermination()
      graft.sources.Snapshots.read(s, mv)
        .select(col("event_type"), col("n"), col("sum_v"), col("cnt_v"),
          col("min_v"), col("max_v"))
        .orderBy(col("event_type"))
    }),

    "w33_v2_stream" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("w33_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      (0L until 3L).foreach(i =>
        graft.sources.Snapshots.commit(s, t,
          ev.filter(pmod(col("event_id"), lit(3)) === i)))
      val out = SparkHygiene.scratchDir("w33_out")
      val ck = SparkHygiene.scratchDir("w33_ck")
      val q = s.readStream.format("graft_snapshots").option("path", t)
        .option("maxVersionsPerTrigger", 1).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).orderBy(col("event_id"))
    }),

    // CHANGE-FEED STREAM WITH ATTRIBUTION — `readChangeFeed=true` adds
    // the Delta CDF metadata columns: every emitted row carries its
    // `_change_type` and the `_commit_version` that introduced it
    // (per-version bins make the attribution exact; the option is
    // rejected on batch reads, where a version has no change story).
    // The downstream CAN therefore build per-commit audit rollups from
    // the stream alone. Oracle: event_id % 3 decides which of the three
    // commits a row landed in, so the attribution is replayable from
    // the raw table.
    "w36_v2_cdf" -> ((s, dir) => {
      val t = SparkHygiene.scratchDir("w36_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      (0L until 3L).foreach(i =>
        graft.sources.Snapshots.commit(s, t,
          ev.filter(pmod(col("event_id"), lit(3)) === i)))
      val out = SparkHygiene.scratchDir("w36_out")
      val ck = SparkHygiene.scratchDir("w36_ck")
      val q = s.readStream.format("graft_snapshots").option("path", t)
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", 1).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .select(col("event_id"), col("user_id"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
        .orderBy(col("event_id"))
    }),

    // LAKEHOUSE-TO-LAKEHOUSE PIPE — the V2 source AND the V2 streaming
    // SINK in one query: three source commits stream one-per-batch into
    // a second snapshot table, each micro-batch committing one
    // destination version through the epoch-idempotent manifest publish
    // (a replayed epoch publishes nothing — the exactly-once contract
    // from BOTH sides, SnapshotWriteSpec pins the replay and restart).
    // The destination is bootstrapped with a schema-only empty v1 (the
    // documented first-write pattern). Oracle = the raw table: a
    // lossless pipe is logically invisible.
    "w35_v2_pipe" -> ((s, dir) => {
      val src = SparkHygiene.scratchDir("w35_src")
      val dst = SparkHygiene.scratchDir("w35_dst")
      val ck = SparkHygiene.scratchDir("w35_ck")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      (0L until 3L).foreach(i =>
        graft.sources.Snapshots.commit(s, src,
          ev.filter(pmod(col("event_id"), lit(3)) === i)))
      graft.sources.Snapshots.commit(s, dst, ev.limit(0))
      val q = s.readStream.format("graft_snapshots").option("path", src)
        .option("maxVersionsPerTrigger", 1).load()
        .writeStream.format("graft_snapshots")
        .option("path", dst).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("graft_snapshots").option("path", dst).load()
        .orderBy(col("event_id"))
    }),

    // STREAMING UPSERT SINK (CDC apply, `option("upsertKey", ...)` —
    // sources/v2/SnapshotUpsertStreamingWrite): three overlapping
    // document slices stream one-per-batch into a keyed table; each
    // epoch is ONE manifest commit that appends the slice AND
    // deletion-vector-suppresses the previously-live rows it replaces —
    // zero file rewrites, later epochs win, epoch replay publishes
    // nothing (UpsertSinkSpec pins replay, restart, and the
    // update-mode aggregation composition). The oracle is
    // last-writer-wins replayed as a slice-wise CASE.
    "w42_stream_upsert" -> ((s, dir) => {
      val src = SparkHygiene.scratchDir("w42_src")
      val dst = SparkHygiene.scratchDir("w42_dst") + "/t"
      val ck = SparkHygiene.scratchDir("w42_ck")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sources.Snapshots.commit(s, src,
        docs.repartitionByRange(4, col("doc_id")))
      graft.sources.Snapshots.commit(s, src,
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 300)
          .withColumn("lang", upper(col("lang"))))
      graft.sources.Snapshots.commit(s, src,
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
          .withColumn("lang", lit("zz")))
      val q = s.readStream.format("graft_snapshots").option("path", src)
        .option("maxVersionsPerTrigger", 1).load()
        .writeStream.format("graft_snapshots")
        .option("path", dst).option("upsertKey", "doc_id")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("graft_snapshots").option("path", dst).load()
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // BACKFILL THROUGH THE STREAMING PIPELINE — the V2 snapshot source
    // feeding a STATEFUL event-time aggregation: three commits hold
    // time-ordered thirds of the event log (the shape a lakehouse
    // backfill actually has), the connector streams them one commit per
    // micro-batch, and the watermark + hourly tumbling window close and
    // emit exactly as they would against a live queue. This is the
    // property that makes the versioned table a REPLAYABLE stream: the
    // same stateful query text runs against history and the live feed.
    // Oracle = batch hourly counts below the final-watermark cut (the
    // w31/w32 convention).
    // TRANSFORM-WITH-STATE (Spark 4's arbitrary-state API, the
    // flatMapGroupsWithState successor) — per-user NEW-PERSONAL-BEST
    // detection (streaming/RecordTracker): 8 bytes of ValueState per
    // key, rows sorted by event time within each batch, the running
    // best carried ACROSS batches by the state store. The corpus
    // arrives as three time-ordered snapshot commits (one micro-batch
    // each), so records that straddle batch boundaries prove the
    // cross-batch state; the oracle replays the semantics as a
    // running-max window over the batch table.
    "w38_tws_records" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      // transformWithState needs column families — RocksDB provider
      // (session-scoped: streamStateSession is an isolated newSession)
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val t = SparkHygiene.scratchDir("w38_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val cuts = ev.agg(
        expr("percentile_approx(ts, 0.34, 10000)").as("c1"),
        expr("percentile_approx(ts, 0.67, 10000)").as("c2")).head()
      val (c1, c2) = (cuts.getTimestamp(0), cuts.getTimestamp(1))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") <= c1))
      graft.sources.Snapshots.commit(s, t,
        ev.filter(col("ts") > c1 && col("ts") <= c2))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") > c2))
      val records = graft.streaming.RecordTracker.records(
        s.readStream.format("graft_snapshots").option("path", t)
          .option("maxVersionsPerTrigger", 1).load())
      val out = SparkHygiene.scratchDir("w38_out")
      val ck = SparkHygiene.scratchDir("w38_ck")
      val q = records.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .select(col("user_id"), col("event_id"), col("value"),
          col("prev_best"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // EVENT-TIME TIMERS on transformWithState — the other half of the
    // API (w38 is data-driven state; this is watermark-driven
    // emission): every event re-arms its key's single timer at
    // last_seen + 1 day, and the key emits ONE inactivity alert when
    // the watermark passes the armed timer — churn detection decided
    // by event time, so replays produce identical alerts. The drain is
    // one data batch + the standard no-data batch whose final
    // watermark (max ts − 30 min) fires the timers; the oracle is
    // therefore exactly "users whose last event is ≥ 1 day + 30 min
    // before corpus end" — a gap the 30-day corpus actually triggers
    // (14 alerts at sf0.01; a 7-day gap would be vacuous on this
    // corpus). RecordTrackerSpec pins the multi-batch re-arm behavior
    // with controlled timestamps.
    "w39_tws_timeout" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val t = SparkHygiene.scratchDir("w39_tbl")
      graft.sources.Snapshots.commit(s, t, Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value")))
      val alerts = graft.streaming.RecordTracker.inactivity(
        s.readStream.format("graft_snapshots").option("path", t).load(),
        gap = "1 day", watermarkDelay = "30 minutes")
      val out = SparkHygiene.scratchDir("w39_out")
      val ck = SparkHygiene.scratchDir("w39_ck")
      alerts.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(out)
        .select(col("user_id"),
          date_format(col("last_seen"), "yyyy-MM-dd HH:mm:ss")
            .as("last_seen"))
        .orderBy(col("user_id"))
    }),

    // TTL STATE on transformWithState (streaming/Suppress) — the third
    // face of the API (w38 data-driven state, w39 event-time timers):
    // alert suppression, first event per (user, event_type) emits and
    // repeats are swallowed while the key's TTL-bounded boolean state
    // lives. The corpus arrives as three time-ordered snapshot commits,
    // so suppression must hold ACROSS micro-batches through the state
    // store; the 6 h TTL is far above the drained run's wall clock, so
    // the result is exactly the batch "row_number() = 1" oracle
    // (SuppressSpec pins the actual expiry + re-alert behavior with a
    // short TTL across separated batches).
    "w40_tws_suppress" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val t = SparkHygiene.scratchDir("w40_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val cuts = ev.agg(
        expr("percentile_approx(ts, 0.34, 10000)").as("c1"),
        expr("percentile_approx(ts, 0.67, 10000)").as("c2")).head()
      val (c1, c2) = (cuts.getTimestamp(0), cuts.getTimestamp(1))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") <= c1))
      graft.sources.Snapshots.commit(s, t,
        ev.filter(col("ts") > c1 && col("ts") <= c2))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") > c2))
      val alerts = graft.streaming.Suppress.firstPerKey(
        s.readStream.format("graft_snapshots").option("path", t)
          .option("maxVersionsPerTrigger", 1).load(),
        java.time.Duration.ofHours(6))
      val out = SparkHygiene.scratchDir("w40_out")
      val ck = SparkHygiene.scratchDir("w40_ck")
      alerts.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(out)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // STREAMING × SCHEMA EVOLUTION: the snapshot source streams a
    // table whose SECOND commit added a column — the stream's schema
    // resolves from the manifest log (the evolved, current schema), and
    // the micro-batch replaying the PRE-evolution commit serves the
    // added column as null straight from the old files (no rewrite, no
    // restart). The fixed date cut keeps the oracle engine-portable.
    "w41_stream_evolve" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val t = SparkHygiene.scratchDir("w41_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val cut = lit("2024-01-10").cast("timestamp")
      graft.sources.Snapshots.commit(s, t,
        ev.filter(col("ts") <= cut).drop("value"))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") > cut))
      val out = SparkHygiene.scratchDir("w41_out")
      val ck = SparkHygiene.scratchDir("w41_ck")
      s.readStream.format("graft_snapshots").option("path", t)
        .option("maxVersionsPerTrigger", 1).load()
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(out)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    }),

    "w34_v2_stream_agg" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val t = SparkHygiene.scratchDir("w34_tbl")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("event_type"))
      val cuts = ev.agg(
        expr("percentile_approx(ts, 0.34, 10000)").as("c1"),
        expr("percentile_approx(ts, 0.67, 10000)").as("c2")).head()
      val (c1, c2) = (cuts.getTimestamp(0), cuts.getTimestamp(1))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") <= c1))
      graft.sources.Snapshots.commit(s, t,
        ev.filter(col("ts") > c1 && col("ts") <= c2))
      graft.sources.Snapshots.commit(s, t, ev.filter(col("ts") > c2))
      val hourly = s.readStream.format("graft_snapshots").option("path", t)
        .option("maxVersionsPerTrigger", 1).load()
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"))
      val out = SparkHygiene.scratchDir("w34_out")
      val ck = SparkHygiene.scratchDir("w34_ck")
      val q = hourly.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cut = ev.agg((max(col("ts")) - expr("INTERVAL 30 MINUTES")
        - expr("INTERVAL 10 SECONDS")).as("cut"))
      s.read.parquet(out)
        .crossJoin(broadcast(cut))
        .filter(col("we") < col("cut"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // W10 streaming exactly-once dedup under at-least-once delivery: the
    // events file read through TWO independent file streams and unioned
    // (every event delivered twice — the redelivery a real queue source
    // produces), then dropDuplicatesWithinWatermark on the event id.
    // The state store keeps one entry per id inside the watermark
    // horizon (event-time bounded, NOT stream-length bounded — the knob
    // that matters for an unbounded 100 TB ingest); both copies of a row
    // are identical, so the surviving row is deterministic and the
    // oracle is simply the batch DISTINCT. Completes the P9 (in-batch
    // dedup) story for the cross-delivery case.
    "w10_stream_dedup" -> ((s0, dir) => {
      // state partitions sized to the corpus (see streamStateSession)
      val s = SparkHygiene.streamStateSession(s0, 8)
      val once = Tables.eventsStream(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val twice = once.unionByName(
        Tables.eventsStream(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))
      // dedup on ALL output columns, not event_id alone: the oracle is
      // DISTINCT over the triple, and keying on event_id only would
      // silently depend on event_id being unique in the generated
      // testdata — a schema regeneration with duplicate ids would then
      // hash-mismatch instead of failing loudly
      val deduped = twice
        .withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark("event_id", "user_id", "event_type")
        .select(col("event_id"), col("user_id"), col("event_type"))
      // see w9's note: construction runs the stream; dirs reaped at exit
      val out = SparkHygiene.scratchDir("w10_out")
      val ck = SparkHygiene.scratchDir("w10_ck")
      val q = deduped.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).orderBy(col("event_id"))
    }),

    "w7_rolling" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("__dec", col("value").cast("decimal(18,6)"))
        .withColumn("n_frame", count(lit(1)).over(w))
        .withColumn("roll_sum", round(sum(col("__dec")).over(w), 4)
          .cast("double"))
        .withColumn("roll_avg",
          round(sum(col("__dec")).over(w).cast("double") / col("n_frame"), 6))
        .select(col("user_id"), col("event_id"), col("n_frame"),
          col("roll_sum"), col("roll_avg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Time-RANGE rolling frame — the value-based complement to w7's
    // row-count frame: per user, activity in the PRECEDING 24 HOURS of
    // each event (count + decimal sum). Same scale shape as w7 — ONE
    // hash exchange on the key, a single streaming frame pass, state
    // bounded by the frame's time horizon — but the frame edge is a
    // timestamp predicate, so bursts widen the frame in rows while the
    // time bound keeps memory fixed per active window. Frame arithmetic
    // runs on epoch MICROSECONDS on both engines (Spark unix_micros,
    // DuckDB epoch_us) so the inclusive [ts−24h, ts] edge is exact —
    // no interval/rounding semantics in play.
    "w11_time_rolling" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
        .rangeBetween(-86400000000L, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("__us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_24h"),
          round(sum(col("value").cast("decimal(18,6)")).over(w), 2)
            .cast("double").as("sum_24h"))
        .orderBy(col("event_id"))
    }),

    // Native session-window aggregation — Spark's session_window()
    // operator (the engine-fused form of w6's lag+running-sum
    // derivation): per user, events merge into a session while each
    // arrives within `gap` of the previous — INCLUSIVE: an event at
    // exactly prev + gap still merges (pinned by WindowFramesSpec
    // against the live operator, the same > convention w6 uses);
    // session end = last event + gap. ONE exchange on the key; the
    // merge is a single ordered pass per key. One definition serves
    // both modes (`EventTimeAgg.sessions` / `.sessionsStream` — the
    // streaming form merges sessions in state and emits each exactly
    // once when the watermark passes its end; EventTimeAggSpec). The
    // DuckDB oracle replays the semantics with the portable lag/gap-sum
    // derivation and min(ts)/max(ts)+gap bounds; epoch-microsecond
    // output keeps timestamp rendering out of the hash.
    "w12_session_window" -> ((s, dir) =>
      graft.streaming.EventTimeAgg.sessions(Tables.events(s, dir), "6 hours")
        .orderBy(col("user_id"), col("session_start"))),

    // W13 stream-STATIC enrichment join — the third Structured
    // Streaming join class (w9 covers stream-stream, w10 stateful
    // dedup): the event stream joins a static dimension table. The
    // point is what ISN'T here: no watermark, no state store — a
    // stream-static inner join is STATELESS, each micro-batch joins
    // against the (re-readable) static side and forgets it, so the
    // operator costs the same at any stream length. Static side
    // broadcasts per batch at this size; at scale it degrades to a
    // shuffle join of the BATCH, never of the accumulated stream.
    // Oracle = the plain batch join.
    "w13_stream_static" -> ((s0, dir) => {
      val s = SparkHygiene.streamStateSession(s0, 8)
      val ev = Tables.eventsStream(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = ev.join(dim, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"),
          col("event_type"), col("c_mktsegment"))
      val out = SparkHygiene.scratchDir("w13_out")
      val ck = SparkHygiene.scratchDir("w13_ck")
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).orderBy(col("event_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "a18_string_agg" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a17_grouping_sets" ->
      """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  GROUPING(event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')) AS lvl,
        |  count(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS
        |  ((event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')),
        |   (event_type), (strftime(CAST(ts AS DATE), '%Y-%m-%d')))
        |ORDER BY lvl, event_type, day""".stripMargin,
    "j13_semi_anti_funnel" ->
      """SELECT e.user_id, e.event_id AS error_id
        |FROM events e
        |WHERE e.event_type = 'error'
        |  AND EXISTS (SELECT 1 FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = e.user_id
        |      AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTES)
        |  AND NOT EXISTS (SELECT 1 FROM events p
        |    WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |      AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTES)
        |ORDER BY user_id, error_id""".stripMargin,
    "w24_funnel" ->
      // the step-by-step scalar definition the one-pass window form is
      // provably equal to: each step's earliest time, restricted to
      // events strictly after the previous step's earliest time
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT u.user_id, v.t1 AS view_ts, c.t2 AS click_ts,
        |  p.t3 AS purchase_ts,
        |  CASE WHEN p.t3 IS NOT NULL THEN 3
        |       WHEN c.t2 IS NOT NULL THEN 2
        |       WHEN v.t1 IS NOT NULL THEN 1 ELSE 0 END AS steps
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "a21_unpivot" ->
      // the long form computed directly: per-(day, type) counts ARE
      // the melted rows (semantics identical to stack over the wide
      // row, including zero counts for absent (day, type) pairs —
      // the cross-join scaffold supplies them)
      """WITH d AS (SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |           FROM events),
        |m(measure) AS (VALUES ('click'), ('error'), ('purchase'),
        |               ('signup'), ('view')),
        |c AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |        event_type AS measure, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT d.day, m.measure, coalesce(c.n, 0) AS n
        |FROM d CROSS JOIN m
        |LEFT JOIN c ON c.day = d.day AND c.measure = m.measure
        |ORDER BY d.day, m.measure""".stripMargin,
    "w28_stream_distinct" -> {
      // t19/w14's sketch replay keyed by epoch-micros day, under the
      // emission cutoff (whole closed days only)
      val hx = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('kmv:' || user_id::VARCHAR), $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString(" + ")
      s"""WITH h AS (SELECT DISTINCT epoch_us(date_trunc('day', ts)) AS win_us,
         |             ($hx) AS h FROM events),
         |r AS (SELECT win_us, h,
         |        row_number() OVER (PARTITION BY win_us ORDER BY h) AS rn
         |      FROM h),
         |s AS (SELECT win_us, count(*) AS n_sketch,
         |        max(CASE WHEN rn = 32 THEN h END) AS hk
         |      FROM r WHERE rn <= 32 GROUP BY win_us),
         |cut AS (SELECT epoch_us(max(ts)) - 1810000000 AS cut_us FROM events)
         |SELECT win_us, n_sketch,
         |  CASE WHEN n_sketch < 32 THEN n_sketch::DOUBLE
         |       ELSE round(31.0 * 1152921504606846976 / hk::DOUBLE, 4) END
         |    AS est_distinct
         |FROM s, cut WHERE win_us + 86400000000 < cut_us
         |ORDER BY win_us""".stripMargin
    },
    "w27_stream_topk" ->
      """WITH e AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us,
        |             event_type AS category FROM events),
        |c AS (SELECT win_us, category, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY win_us
        |        ORDER BY n DESC, category) AS rk FROM c),
        |cut AS (SELECT epoch_us(max(ts)) - 1810000000 AS cut_us FROM events)
        |SELECT win_us, category, n, CAST(rk AS INT) AS rk
        |FROM r, cut WHERE rk <= 3 AND win_us + 3600000000 < cut_us
        |ORDER BY win_us, rk""".stripMargin,
    "w26_stream_asof" ->
      // j7's oracle with the purchase timestamp carried through and the
      // w20-style emission cutoff applied on both sides
      """WITH u AS (
        |  SELECT user_id, ts, event_id AS pid, CAST(NULL AS BIGINT) AS cid,
        |         CAST(NULL AS DOUBLE) AS cval, 1 AS kind
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, NULL, event_id, value, 0
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT pid, user_id, epoch_us(ts) AS p_us,
        |    last_value(cid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, kind, coalesce(pid, cid)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |    last_value(cval IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, kind, coalesce(pid, cid)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cval
        |  FROM u),
        |cut AS (SELECT epoch_us(max(ts)) - 1810000000 AS cut_us FROM events
        |        WHERE event_type IN ('click', 'purchase'))
        |SELECT pid AS purchase_id, user_id, click_id,
        |       round(cval, 2) AS click_value
        |FROM w, cut WHERE pid IS NOT NULL AND p_us < cut_us
        |ORDER BY purchase_id""".stripMargin,
    "w25_stream_funnel" -> {
      // the funnel machine replayed sequentially: one recursion step
      // per (user, event) in (ts, event_id) order; before each event
      // the step deadline is checked (timeout → abandon, machine
      // idles), then the transition runs on the post-timeout state.
      // Work is in epoch micros; T = 30 min = 1 800 000 000 us.
      val tUs = 1800000000L
      // post-timeout state and the timeout predicate, inlined at every
      // use (recursive CTEs can't carry laterals portably)
      val tSt = s"(CASE WHEN m.st = 1 AND e.us > m.v + $tUs THEN 0 " +
        s"WHEN m.st = 2 AND e.us > m.c + $tUs THEN 0 ELSE m.st END)"
      val tout = s"((m.st = 1 AND e.us > m.v + $tUs) OR " +
        s"(m.st = 2 AND e.us > m.c + $tUs))"
      val conv = s"($tSt = 2 AND e.typ = 'purchase' AND e.us > m.c)"
      s"""WITH RECURSIVE ev AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id AS id,
         |         event_type AS typ,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY ts, event_id) AS rn
         |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
         |mx AS (SELECT user_id, max(rn) AS nmax FROM ev GROUP BY user_id),
         |cut AS (SELECT epoch_us(max(ts)) - 1810000000 AS cut_us FROM events),
         |m AS (
         |  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS st,
         |         CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS c,
         |         CAST(0 AS BIGINT) AS att,
         |         CAST(NULL AS VARCHAR) AS o_outcome, 0 AS o_steps,
         |         CAST(0 AS BIGINT) AS o_start, CAST(0 AS BIGINT) AS o_end,
         |         CAST(0 AS BIGINT) AS o_att
         |  FROM mx
         |  UNION ALL
         |  SELECT e.user_id, e.rn,
         |    CASE WHEN $tSt = 0 AND e.typ = 'view' THEN 1
         |         WHEN $tSt = 1 AND e.typ = 'click' AND e.us > m.v THEN 2
         |         WHEN $conv THEN 0
         |         ELSE $tSt END,
         |    CASE WHEN $tSt = 0 AND e.typ = 'view' THEN e.us ELSE m.v END,
         |    CASE WHEN $tSt = 1 AND e.typ = 'click' AND e.us > m.v
         |         THEN e.us ELSE m.c END,
         |    CASE WHEN $tSt = 0 AND e.typ = 'view' THEN m.att + 1
         |         ELSE m.att END,
         |    CASE WHEN $tout THEN 'abandoned'
         |         WHEN $conv THEN 'converted' END,
         |    CASE WHEN $tout THEN m.st WHEN $conv THEN 3 ELSE 0 END,
         |    m.v,
         |    CASE WHEN $tout AND m.st = 1 THEN m.v + $tUs
         |         WHEN $tout AND m.st = 2 THEN m.c + $tUs
         |         WHEN $conv THEN e.us ELSE 0 END,
         |    m.att
         |  FROM m JOIN ev e ON e.user_id = m.user_id AND e.rn = m.rn + 1),
         |outs AS (
         |  SELECT user_id, o_att AS attempt, o_outcome AS outcome,
         |         o_steps AS steps, o_start AS start_us, o_end AS end_us
         |  FROM m WHERE o_outcome IS NOT NULL
         |  UNION ALL
         |  SELECT m.user_id, m.att, 'abandoned', m.st, m.v,
         |         CASE WHEN m.st = 1 THEN m.v + $tUs ELSE m.c + $tUs END
         |  FROM m JOIN mx ON mx.user_id = m.user_id AND m.rn = mx.nmax
         |  WHERE m.st > 0)
         |SELECT user_id, attempt, outcome, steps, start_us, end_us
         |FROM outs, cut WHERE end_us < cut_us
         |ORDER BY user_id, attempt""".stripMargin
    },
    "w16_lead_gap" ->
      """WITH l AS (SELECT user_id, event_id, ts,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |FROM events)
        |SELECT user_id, event_id,
        |  epoch_us(next_ts) - epoch_us(ts) AS gap_us,
        |  (next_ts IS NOT NULL AND
        |   epoch_us(next_ts) - epoch_us(ts) > 3600000000) AS long_gap
        |FROM l ORDER BY user_id, event_id""".stripMargin,
    "p14_json_props" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
        |SELECT event_type, count(*) AS n,
        |  count(*) FILTER (k IS NULL) AS n_bad,
        |  min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(CAST(k AS BIGINT)) AS BIGINT) AS sum_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "w17_rank_report" ->
      """WITH t AS (
        |  SELECT event_type, user_id,
        |    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
        |      AS total_value
        |  FROM events GROUP BY event_type, user_id)
        |SELECT event_type, user_id, total_value,
        |  row_number() OVER w AS rn,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM t
        |WINDOW w AS (PARTITION BY event_type
        |             ORDER BY total_value DESC, user_id ASC)
        |ORDER BY event_type, rn""".stripMargin,
    "a16_pivot" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "a6_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rk FROM c)
        |SELECT user_id, event_type AS top_type, cnt FROM r WHERE rk = 1
        |ORDER BY user_id""".stripMargin,
    "a7_date_range" ->
      """SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS earliest,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w2_chrono_topk" ->
      """WITH r AS (SELECT user_id, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |FROM events)
        |SELECT user_id, rk, event_id, event_type FROM r WHERE rk <= 3
        |ORDER BY user_id, rk""".stripMargin,
    "a10_histogram" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,
    "st5_trigger" ->
      """SELECT user_id, count(*) AS n, CAST(user_id % 4 AS INT) AS sc,
        |  (count(*) > (user_id % 4 + 1) * 18 AND
        |   (count(*) < 54 OR user_id % 4 = 0)) AS fired
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same union+running-last formulation (portable; DuckDB ASOF JOIN
    // would also agree but the window form pins tie-break semantics)
    "w6_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER
        |              (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) > 1800000000
        |       THEN 1 ELSE 0 END AS brk,
        |  epoch_us(ts) AS us
        |  FROM events),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |      FROM e)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    // w6's gap-break replay, emitting session_window's bounds:
    // start = min(ts), end = max(ts) + gap
    "w19_native_session" ->
      """WITH e AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER
        |              (PARTITION BY user_id ORDER BY epoch_us(ts))) > 1800000000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
        |      FROM e)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sidx ORDER BY user_id, s_start""".stripMargin,
    // two-window assignment: slide 1800 s, size 3600 s ⇒ each event's
    // windows start at floor(ts/1800)·1800 and 1800 s earlier
    "w21_hopping_window" ->
      """WITH w AS (SELECT event_type, value,
        |  unnest([to_timestamp((epoch_us(ts) // 1800000000) * 1800),
        |          to_timestamp((epoch_us(ts) // 1800000000) * 1800 - 1800)])
        |    AS win_start
        |  FROM events)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
        |    AS total_value
        |FROM w GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    // w21's replay restricted to windows the final watermark emitted
    "w22_stream_hopping" ->
      """WITH w AS (SELECT event_type, value,
        |  unnest([to_timestamp((epoch_us(ts) // 1800000000) * 1800),
        |          to_timestamp((epoch_us(ts) // 1800000000) * 1800 - 1800)])
        |    AS ws
        |  FROM events),
        |cut AS (SELECT max(ts) - INTERVAL 30 MINUTE - INTERVAL 10 SECOND AS c
        |        FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
        |    AS total_value
        |FROM w, cut
        |WHERE ws + INTERVAL 1 HOUR < c
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    // w19's replay restricted to sessions the final watermark emitted
    "w20_stream_session" ->
      """WITH e AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER
        |              (PARTITION BY user_id ORDER BY epoch_us(ts))) > 1800000000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
        |      FROM e),
        |cut AS (SELECT max(ts) - INTERVAL 30 MINUTE - INTERVAL 10 SECOND AS c
        |        FROM events)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
        |FROM s, cut GROUP BY user_id, sidx, c
        |HAVING max(ts) + INTERVAL 30 MINUTE < c
        |ORDER BY user_id, s_start""".stripMargin,
    "w23_stream_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_type, ts AS valid_from, event_id
        |  FROM ordered WHERE prev IS NULL OR event_type <> prev),
        |v AS (
        |  SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |                           ORDER BY valid_from, event_id) AS valid_to
        |  FROM changes)
        |SELECT user_id, event_type, valid_from, valid_to
        |FROM v WHERE valid_to IS NOT NULL
        |ORDER BY user_id, valid_from""".stripMargin,
    "j7_asof" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id AS pid, CAST(NULL AS BIGINT) AS cid,
        |         CAST(NULL AS DOUBLE) AS cval, 1 AS kind
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, NULL, event_id, value, 0
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT pid, user_id,
        |    last_value(cid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, kind, coalesce(pid, cid)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |    last_value(cval IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, kind, coalesce(pid, cid)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cval
        |  FROM u)
        |SELECT pid AS purchase_id, user_id, click_id,
        |       round(cval, 2) AS click_value
        |FROM w WHERE pid IS NOT NULL ORDER BY purchase_id""".stripMargin,
    "j11_asof_forward" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id AS pid, CAST(NULL AS BIGINT) AS cid,
        |         CAST(NULL AS DOUBLE) AS cval, 1 AS kind
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, NULL, event_id, value, 0
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT pid, user_id,
        |    last_value(cid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, kind, coalesce(pid, cid)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |    last_value(cval IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, kind, coalesce(pid, cid)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cval
        |  FROM u)
        |SELECT pid AS purchase_id, user_id, click_id,
        |       round(cval, 2) AS click_value
        |FROM w WHERE pid IS NOT NULL ORDER BY purchase_id""".stripMargin,
    "j8_interval_join" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id,
        |       epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
        |FROM events e JOIN events c
        |  ON e.event_type = 'error' AND c.event_type = 'click'
        | AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
        |ORDER BY error_id, click_id""".stripMargin,
    "j9_range_rewrite" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id,
        |       epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
        |FROM events e JOIN events c
        |  ON e.event_type = 'error' AND c.event_type = 'click'
        | AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
        |ORDER BY error_id, click_id""".stripMargin,
    "w10_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin,
    // the streaming semi join must converge to the batch EXISTS
    "w18_stream_semi" ->
      """SELECT user_id, event_id AS error_id FROM events e
        |WHERE event_type = 'error'
        |  AND EXISTS (SELECT 1 FROM events c
        |              WHERE c.event_type = 'click'
        |                AND c.user_id = e.user_id
        |                AND c.ts > e.ts
        |                AND c.ts <= e.ts + INTERVAL 10 MINUTE)
        |ORDER BY user_id, error_id""".stripMargin,
    // the stream-stream join must converge to the batch join: j8's oracle
    "w9_stream_join" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id,
        |       epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
        |FROM events e JOIN events c
        |  ON e.event_type = 'error' AND c.event_type = 'click'
        | AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
        |ORDER BY error_id, click_id""".stripMargin,
    // per-slot left join (outer rows are per (interval, slot)); null
    // rows cut to the watermark horizon both engines can agree on
    "w9_stream_join_outer" ->
      """WITH err AS (
        |  SELECT event_id AS error_id, ts AS win_start,
        |         ts + INTERVAL 10 MINUTES AS win_end
        |  FROM events WHERE event_type = 'error'),
        |clk AS (SELECT event_id AS click_id, ts FROM events WHERE event_type = 'click'),
        |slots AS (
        |  SELECT e.*, unnest(generate_series(
        |    CAST(floor(epoch_us(win_start) / 600000000) AS BIGINT),
        |    CAST(floor((epoch_us(win_end) - 1) / 600000000) AS BIGINT))) AS slot
        |  FROM err e),
        |j AS (
        |  SELECT s.error_id, s.win_start, c.click_id,
        |         epoch_us(c.ts) - epoch_us(s.win_start) AS gap_us
        |  FROM slots s LEFT JOIN clk c
        |    ON CAST(floor(epoch_us(c.ts) / 600000000) AS BIGINT) = s.slot
        |   AND c.ts >= s.win_start AND c.ts < s.win_end),
        |wm AS (
        |  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'error'),
        |               (SELECT max(ts) FROM events WHERE event_type = 'click'))
        |         - INTERVAL 30 MINUTES - INTERVAL 10 MINUTES
        |         - INTERVAL 10 SECONDS AS cut FROM (SELECT 1))
        |SELECT error_id, strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       click_id, gap_us
        |FROM j, wm
        |WHERE click_id IS NOT NULL OR win_start < cut
        |ORDER BY error_id, click_id""".stripMargin,
    // chained inner joins converge to the batch 3-way join verbatim
    "w29_stream_join_3way" ->
      """SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
        |       p.event_id AS purchase_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS span_us
        |FROM events c
        |JOIN events e
        |  ON c.event_type = 'click' AND e.event_type = 'error'
        | AND e.user_id = c.user_id
        | AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 360 MINUTE
        |JOIN events p
        |  ON p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 360 MINUTE
        |ORDER BY click_id, error_id, purchase_id""".stripMargin,
    // DISTINCT (the redelivery must vanish) then the batch two-level
    // rollup, below the same delayed cut as w31
    // timer-fired inactivity ≡ last event at least gap+delay before end
    "w39_tws_timeout" ->
      """WITH b AS (SELECT user_id, max(ts) AS last_seen
        |           FROM events GROUP BY 1),
        |g AS (SELECT max(ts) AS gmax FROM events)
        |SELECT user_id,
        |  strftime(last_seen, '%Y-%m-%d %H:%M:%S') AS last_seen
        |FROM b, g
        |WHERE last_seen + INTERVAL 1 DAY <= gmax - INTERVAL 30 MINUTE
        |ORDER BY user_id""".stripMargin,

    // pre-evolution rows carry null for the added column
    "w41_stream_evolve" ->
      """SELECT event_id, user_id,
        |  CASE WHEN ts > TIMESTAMP '2024-01-10 00:00:00' THEN value END
        |    AS value
        |FROM events ORDER BY event_id""".stripMargin,
    // first-per-key under a TTL no drained run can outlive ≡ rank 1
    "w40_tws_suppress" ->
      """WITH r AS (SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn
        |FROM events)
        |SELECT user_id, event_type, event_id FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    // new-personal-best ≡ running-max window in (ts, event_id) order
    "w38_tws_records" ->
      """WITH o AS (SELECT user_id, event_id, value,
        |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
        |FROM events)
        |SELECT user_id, event_id, value, prev_best FROM o
        |WHERE prev_best IS NULL OR value > prev_best
        |ORDER BY user_id, event_id""".stripMargin,

    // the streamed MV vs the rollup recomputed from the final base
    // state (bootstrap < 3000, append [3000,5000), erase keys)
    "w37_stream_mv" ->
      """WITH m AS (SELECT event_id, event_type,
        |  CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
        |FROM events
        |WHERE event_id < 5000
        |  AND event_id NOT IN (7, 1203, 2048, 3333, 4999))
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_v, count(v) AS cnt_v,
        |  min(v) AS min_v, max(v) AS max_v
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the resample replayed relationally: per-user day series from
    // generate_series, LOCF via last_value IGNORE NULLS
    "w34_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS day_value,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(day) AS lo, max(day) AS hi
        |          FROM daily GROUP BY 1),
        |alldays AS (
        |  SELECT user_id, CAST(gs AS DATE) AS day
        |  FROM spans, unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS t(gs)),
        |joined AS (
        |  SELECT a.user_id, a.day, coalesce(d.n_events, 0) AS n_events,
        |    d.day_value, (d.day_value IS NULL) AS is_gap
        |  FROM alldays a
        |  LEFT JOIN daily d ON a.user_id = d.user_id AND a.day = d.day)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_events,
        |  round(last_value(day_value IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS filled_value,
        |  is_gap
        |FROM joined ORDER BY user_id, day""".stripMargin,

    "w32_stream_dedup_rollup" ->
      """WITH d AS (SELECT DISTINCT event_id, ts, event_type FROM (
        |    SELECT event_id, ts, event_type FROM events
        |    UNION ALL
        |    SELECT event_id, ts, event_type FROM events)),
        |h AS (SELECT date_trunc('hour', ts) AS hs, event_type,
        |  count(*) AS n_h FROM d GROUP BY 1, 2),
        |cut AS (SELECT max(ts) - INTERVAL 90 MINUTE - INTERVAL 10 SECOND
        |        AS c FROM events)
        |SELECT strftime(date_trunc('day', hs), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, CAST(sum(n_h) AS BIGINT) AS n
        |FROM h, cut
        |WHERE date_trunc('day', hs) + INTERVAL 1 DAY < c
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // a lossless versioned drain ≡ the raw table
    "w33_v2_stream" ->
      """SELECT event_id, ts, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin,
    // change attribution replayed from the commit rule
    "w36_v2_cdf" ->
      """SELECT event_id, user_id,
        |  'insert' AS change_type,
        |  event_id % 3 + 1 AS commit_version
        |FROM events ORDER BY event_id""".stripMargin,
    // streaming upsert ≡ last-writer-wins by slice order
    "w42_stream_upsert" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id >= 200 AND doc_id < 400 THEN 'zz'
        |       WHEN doc_id >= 100 AND doc_id < 200 THEN upper(lang)
        |       ELSE lang END AS lang,
        |  length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // a lossless source→sink pipe ≡ the raw table
    "w35_v2_pipe" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY event_id""".stripMargin,
    // batch hourly counts below the final-watermark cut — time-ordered
    // commits make the backfill watermark-equivalent to a live feed
    "w34_v2_stream_agg" ->
      """WITH cut AS (SELECT max(ts) - INTERVAL 30 MINUTE
        |  - INTERVAL 10 SECOND AS c FROM events)
        |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n
        |FROM events, cut
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < c
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the batch two-level rollup, restricted to daily windows the final
    // watermark (delayed by the hourly window size) provably emitted
    "w31_stream_agg_chain" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hs, event_type,
        |  count(*) AS n_h FROM events GROUP BY 1, 2),
        |cut AS (SELECT max(ts) - INTERVAL 90 MINUTE - INTERVAL 10 SECOND
        |        AS c FROM events)
        |SELECT strftime(date_trunc('day', hs), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, CAST(sum(n_h) AS BIGINT) AS n, count(*) AS n_hours
        |FROM h, cut
        |WHERE date_trunc('day', hs) + INTERVAL 1 DAY < c
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the batch left-join aggregate, restricted to windows the final
    // watermark (delayed by join₁'s 360-min horizon) provably emitted
    "w30_stream_outer_agg" ->
      """WITH c AS (SELECT user_id, ts AS cts FROM events
        |           WHERE event_type = 'click'),
        |e AS (SELECT user_id AS eu, event_id AS error_id, ts AS ets
        |      FROM events WHERE event_type = 'error'),
        |cut AS (SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'click'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'error'))
        |  - INTERVAL 390 MINUTE - INTERVAL 10 SECOND AS cut),
        |j AS (SELECT c.cts, e.error_id FROM c LEFT JOIN e
        |  ON c.user_id = e.eu AND e.ets > c.cts
        | AND e.ets <= c.cts + INTERVAL 360 MINUTE)
        |SELECT strftime(date_trunc('hour', cts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  (error_id IS NOT NULL)::INT AS has_error, count(*) AS n
        |FROM j, cut
        |WHERE date_trunc('hour', cts) + INTERVAL 1 HOUR < cut.cut
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w15_stream_join_full" ->
      """WITH err AS (
        |  SELECT event_id AS error_id, ts AS win_start,
        |         ts + INTERVAL 10 MINUTES AS win_end
        |  FROM events WHERE event_type = 'error'),
        |clk AS (SELECT event_id AS click_id, ts FROM events WHERE event_type = 'click'),
        |slots AS (
        |  SELECT e.*, unnest(generate_series(
        |    CAST(floor(epoch_us(win_start) / 600000000) AS BIGINT),
        |    CAST(floor((epoch_us(win_end) - 1) / 600000000) AS BIGINT))) AS slot
        |  FROM err e),
        |j AS (
        |  SELECT s.error_id, s.win_start, c.click_id, c.ts,
        |         epoch_us(c.ts) - epoch_us(s.win_start) AS gap_us
        |  FROM slots s FULL OUTER JOIN clk c
        |    ON CAST(floor(epoch_us(c.ts) / 600000000) AS BIGINT) = s.slot
        |   AND c.ts >= s.win_start AND c.ts < s.win_end),
        |wm AS (
        |  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'error'),
        |               (SELECT max(ts) FROM events WHERE event_type = 'click'))
        |         - INTERVAL 30 MINUTES - INTERVAL 10 MINUTES
        |         - INTERVAL 10 SECONDS AS cut_i,
        |         least((SELECT max(ts) FROM events WHERE event_type = 'error'),
        |               (SELECT max(ts) FROM events WHERE event_type = 'click'))
        |         - INTERVAL 30 MINUTES - INTERVAL 10 SECONDS AS cut_p
        |  FROM (SELECT 1))
        |SELECT error_id, strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       click_id, gap_us
        |FROM j, wm
        |WHERE (error_id IS NOT NULL AND click_id IS NOT NULL)
        |   OR (click_id IS NULL AND win_start < cut_i)
        |   OR (error_id IS NULL AND ts < cut_p)
        |ORDER BY error_id, click_id""".stripMargin,
    "w8_hourly_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,
    "w7_rolling" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_frame,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 4) AS DOUBLE) AS roll_sum,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |        / (count(*) OVER w), 6) AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "a13_cum_distinct" ->
      """WITH f AS (SELECT user_id, event_type, min(CAST(ts AS DATE)) AS day
        |           FROM events GROUP BY user_id, event_type),
        |d AS (SELECT event_type, day, count(*) AS new_users
        |      FROM f GROUP BY event_type, day)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM d ORDER BY event_type, day""".stripMargin,
    "w13_stream_static" ->
      """SELECT event_id, user_id, event_type, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,
    "w11_time_rolling" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_24h,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w12_session_window" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER
        |              (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) > 21600000000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM e)
        |SELECT user_id, min(us) AS session_start,
        |  max(us) + 21600000000 AS session_end,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)
}
