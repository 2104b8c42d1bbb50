package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Summarize, TemporalJoins}

/** The flagship A9 query over the full news pipeline, with a DuckDB
  * oracle that replays the ENTIRE pipeline in SQL: planted-group
  * clustering (groups are ε-separated by construction, so membership is
  * group membership), the A4 counter quirks, the recursive ST5
  * trigger/summary_count evolution, the deterministic summarizer stub,
  * A6/A7 roll-ups, and UUIDv3 cluster ids (md5 with version/variant
  * bit-patching, matching java.util.UUID.nameUUIDFromBytes).
  */
object NewsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a9_ui_clusters" -> ((s, dir) => NewsPipeline.uiClusters(s, dir)))

  val oracleSql: Map[String, String] = Map(
    "a9_ui_clusters" ->
      """WITH RECURSIVE arts AS (
        |  SELECT doc_id,
        |         doc_id % 8 AS g,
        |         (doc_id // 8) % 5 AS b,
        |         lpad(doc_id::VARCHAR, 6, '0') AS id,
        |         'Group ' || (doc_id % 8)::VARCHAR || ' story ' ||
        |           lpad(doc_id::VARCHAR, 6, '0') AS title,
        |         repeat('plant' || (doc_id % 8)::VARCHAR || ' ', 30) ||
        |           substr(text, 1, 20) AS body,
        |         strftime(TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id),
        |                  '%Y-%m-%d %H:%M:%S') AS pub,
        |         'org' || (doc_id % 4)::VARCHAR AS org1,
        |         'loc' || (doc_id % 8)::VARCHAR AS loc1,
        |         'locx' || (doc_id % 3)::VARCHAR AS loc2
        |  FROM documents),
        |bn AS (SELECT g, b, count(*) AS bn FROM arts GROUP BY g, b),
        |st AS (
        |  SELECT g, -1 AS b, CAST(NULL AS BIGINT) AS n, 0 AS sc,
        |         CAST(NULL AS INT) AS lastfire
        |  FROM (SELECT DISTINCT g FROM arts)
        |  UNION ALL
        |  SELECT st.g, st.b + 1,
        |    CASE WHEN cb.bn IS NULL THEN st.n
        |         WHEN st.n IS NULL THEN cb.bn + 1
        |         ELSE st.n + cb.bn - 1 END,
        |    st.sc + CASE WHEN cb.bn IS NOT NULL
        |        AND (CASE WHEN st.n IS NULL THEN cb.bn + 1 ELSE st.n + cb.bn - 1 END)
        |            > 2 * (st.sc + 1)
        |        AND ((CASE WHEN st.n IS NULL THEN cb.bn + 1 ELSE st.n + cb.bn - 1 END) < 6
        |             OR st.sc = 0)
        |      THEN 1 ELSE 0 END,
        |    CASE WHEN cb.bn IS NOT NULL
        |        AND (CASE WHEN st.n IS NULL THEN cb.bn + 1 ELSE st.n + cb.bn - 1 END)
        |            > 2 * (st.sc + 1)
        |        AND ((CASE WHEN st.n IS NULL THEN cb.bn + 1 ELSE st.n + cb.bn - 1 END) < 6
        |             OR st.sc = 0)
        |      THEN st.b + 1 ELSE st.lastfire END
        |  FROM st LEFT JOIN bn cb ON cb.g = st.g AND cb.b = st.b + 1
        |  WHERE st.b < 4),
        |fin AS (SELECT g, n, sc, lastfire FROM st WHERE b = 4 AND lastfire IS NOT NULL),
        |mem AS (SELECT a.*, f.lastfire FROM arts a JOIN fin f ON f.g = a.g
        |        WHERE a.b <= f.lastfire),
        |summ AS (SELECT g,
        |    substr(substr(string_agg('title: ' || title || ', summary: ' || body,
        |                             chr(10) ORDER BY pub, id), 1, 12000), 1, 400) AS gs,
        |    first(title ORDER BY pub, id) AS descr
        |  FROM mem GROUP BY g),
        |locs AS (SELECT g, v, count(*) AS c FROM (
        |    SELECT g, unnest([loc1, loc2]) AS v FROM mem) GROUP BY g, v),
        |lmode AS (SELECT g, v FROM (
        |    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY c DESC, v) AS rk
        |    FROM locs) WHERE rk = 1),
        |orgs AS (SELECT g, org1 AS v, count(*) AS c FROM mem GROUP BY g, org1),
        |omode AS (SELECT g, v FROM (
        |    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY c DESC, v) AS rk
        |    FROM orgs) WHERE rk = 1),
        |drange AS (SELECT g, min(pub) AS mn, max(pub) AS mx FROM mem GROUP BY g),
        |total AS (SELECT g, count(*) AS cnt,
        |                 min(CASE WHEN b = 0 THEN id END) AS first_id
        |          FROM arts GROUP BY g),
        |pkx AS (SELECT g, md5('graft-cluster:' || first_id) AS h FROM total),
        |pk AS (SELECT g,
        |    substr(h,1,8) || '-' || substr(h,9,4) || '-3' || substr(h,14,3) || '-' ||
        |    CASE substr(h,17,1)
        |      WHEN '0' THEN '8' WHEN '1' THEN '9' WHEN '2' THEN 'a' WHEN '3' THEN 'b'
        |      WHEN '4' THEN '8' WHEN '5' THEN '9' WHEN '6' THEN 'a' WHEN '7' THEN 'b'
        |      WHEN '8' THEN '8' WHEN '9' THEN '9' WHEN 'a' THEN 'a' WHEN 'b' THEN 'b'
        |      WHEN 'c' THEN '8' WHEN 'd' THEN '9' WHEN 'e' THEN 'a' ELSE 'b' END ||
        |    substr(h,18,3) || '-' || substr(h,21,12) AS pkid
        |  FROM pkx)
        |SELECT pk.pkid AS PK, fin.n AS number_of_articles, total.cnt AS article_count,
        |       summ.descr AS description, summ.gs AS generated_summary,
        |       lmode.v AS most_common_location, omode.v AS most_common_organization,
        |       drange.mn AS earliest_date, drange.mx AS latest_date
        |FROM fin JOIN total USING (g) JOIN pk USING (g) JOIN summ USING (g)
        |  JOIN lmode USING (g) JOIN omode USING (g) JOIN drange USING (g)
        |WHERE total.cnt > 2
        |ORDER BY number_of_articles DESC, PK""".stripMargin)
}
