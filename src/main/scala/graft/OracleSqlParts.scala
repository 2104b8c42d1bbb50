package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Summarize, TemporalJoins}

/** Oracle-checked query catalogs beyond the baseline four.
  *
  * Every query here has a DuckDB-equivalent SQL (same column names, same
  * rounding, same tie-breaks) so the driver's hash compare is exact.
  * Floats are rounded on BOTH sides; rankings order by the ROUNDED value
  * with an id tie-break so rank boundaries can't diverge between engines.
  *
  * PORTABLE-AGGREGATION CONVENTION (round-7, after the w6 flake): double
  * addition is not associative, so any multi-row `sum`/`avg` over doubles
  * whose result is compared exactly depends on the partial-aggregation
  * combine order — Spark (parallel, task-completion order) and DuckDB
  * (its own order) can land on opposite sides of a rounding boundary,
  * and the SAME engine can flip run-to-run. Every such roll-up therefore
  * sums in decimal — `sum(x.cast("decimal(p,s)"))` / DuckDB
  * `sum(CAST(x AS DECIMAL(p,s)))` — which is exact and order-independent,
  * then casts back to double after the `round` (means: decimal sum cast
  * to double, divided by the count in double). Applied to q1_agg, a3,
  * t9, t12, t13, w6. Single-value `round(expr)` projections and integer
  * sums are order-safe and stay in double. The remaining audited
  * exceptions are the dot products inside the s1-s4/j1/j5/d5/d6 oracles:
  * those sum over one BOUNDED per-key vector (≤ dim elements, exact
  * bit-identical inputs on both sides), not over data-scale row sets,
  * and the result is rounded at 4 dp against ≤ dim·ulp ≈ 1e-13
  * accumulation error, so a boundary hit needs an input constructed for
  * it — accepted and documented rather than rewritten, since decimal
  * list-folds are not expressible in DuckDB's list_dot_product form.
  */
/** SQL fragments shared by several catalogs' oracles — one source of
  * truth for idioms that MUST stay bit-identical across queries.
  */
private[graft] object OracleSqlParts {

  /** Quoted stopword list for DuckDB `IN (...)` — quoting lives here
    * once so an apostrophe ever added to TextFns.stopwordsEn is fixed
    * in one place. */
  val stopList: String = TextFns.stopwordsEn.map(w => s"'$w'").mkString(", ")

  /** Quality-score blend over (text, toks) columns — shared by
    * t2_quality and t17_source_cap so the expression cannot drift
    * between their oracles. Mirrors TextFns.qualityScoreTokens
    * digit-for-digit (same IEEE ops, same 6-dp round).
    */
  def qualitySql(textCol: String, toksCol: String): String =
    s"""round(
       |  least(length($textCol)/500.0, 1.0)*0.4 +
       |  (CASE WHEN length($textCol) > 0
       |        THEN length(regexp_replace($textCol, '[^A-Za-z ]', '', 'g'))*1.0/length($textCol)
       |        ELSE 0.0 END)*0.4 +
       |  least((CASE WHEN len($toksCol) > 0
       |              THEN len(list_filter($toksCol, x -> x IN ($stopList)))*1.0/len($toksCol)
       |              ELSE 0.0 END)*4.0, 1.0)*0.2, 6)""".stripMargin

  /** Winnowing CTE chain over `src(doc_id, text)`, replaying
    * operators/Winnowing.fingerprints digit-for-digit: 28-bit md5 gram
    * hashes and the argmin encoding v = h·2^32 + (2^32−1−pos). Emits
    * CTEs n/p/g/v/m; consumers read window minima from
    * m(doc_id, pos, vmin) (rows with pos ≥ w are full windows). Shared
    * by t16_fingerprint and d15_containment so the encoding cannot
    * drift between their oracles. */
  def winnowingCtes(src: String, k: Int, w: Int): String = {
    val h7 = (1 to 7).map(i =>
      s"(strpos('0123456789abcdef', substr(hx, $i, 1)) - 1) * ${math.pow(16, 7 - i).toLong}")
      .mkString(" + ")
    s"""n AS (SELECT doc_id,
       |  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM $src),
       |p AS (SELECT doc_id, unnest(generate_series(1, length(t) - ${k - 1})) AS pos, t
       |      FROM n WHERE length(t) >= ${k + w - 1}),
       |g AS (SELECT doc_id, pos, md5(substr(t, pos::INT, $k)) AS hx FROM p),
       |v AS (SELECT doc_id, pos,
       |        ($h7) * 4294967296 + (4294967295 - pos) AS v FROM g),
       |m AS (SELECT doc_id, pos, min(v) OVER (PARTITION BY doc_id
       |        ORDER BY pos ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS vmin
       |      FROM v)""".stripMargin
  }
}
