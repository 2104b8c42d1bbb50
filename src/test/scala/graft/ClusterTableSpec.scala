package graft

import org.apache.spark.sql.functions._

import graft.operators.ClusterTable

class ClusterTableSpec extends SparkSpec {
  import spark.implicits._

  private val clock = "2024-06-01T00:00:00"

  private def assignments(rows: (String, String, Boolean, Int, Int)*) =
    rows.toDF("article_id", "cluster_id", "is_cluster", "cluster_size", "batch_new")

  private def articles(rows: (String, String, String, String, String)*) =
    rows.toDF("id", "title", "summary", "text", "publication_date")

  test("A4 counter: new metadata = batch_new + 1 (process_records.py:224)") {
    val t = ClusterTable.emptyTable(spark)
    val up = ClusterTable.upsertRows(t,
      assignments(("a1", "c1", true, 3, 3), ("a2", "c1", true, 3, 3),
        ("a3", "c1", true, 3, 3)),
      articles(("a1", "T1", "S1", "X1", "2024-01-01 00:00:00"),
        ("a2", "T2", "S2", "X2", "2024-01-02 00:00:00"),
        ("a3", "T3", "S3", "X3", "2024-01-03 00:00:00")), clock)
    val meta = up.filter(col("row_type") === "metadata").head()
    assert(meta.getAs[Int]("number_of_articles") == 4) // 3 + 1, quirk preserved
    assert(meta.getAs[String]("created_at") == clock)
    assert(meta.getAs[Int]("summary_count") == 0)
    assert(up.filter(col("row_type") === "article").count() == 3)
  }

  test("A4 counter: existing metadata += batch_new - 1 (process_records.py:209-210)") {
    val t0 = ClusterTable.emptyTable(spark)
    val up1 = ClusterTable.upsertRows(t0,
      assignments(("a1", "c1", true, 2, 2), ("a2", "c1", true, 2, 2)),
      articles(("a1", "T1", "S1", "X1", "2024-01-01 00:00:00"),
        ("a2", "T2", "S2", "X2", "2024-01-02 00:00:00")), clock)
    val t1 = ClusterTable.merge(t0, up1)
    val up2 = ClusterTable.upsertRows(t1,
      assignments(("a3", "c1", true, 3, 2), ("a4", "c1", true, 3, 2)),
      articles(("a3", "T3", "S3", "X3", "2024-01-03 00:00:00"),
        ("a4", "T4", "S4", "X4", "2024-01-04 00:00:00")), clock)
    val meta = up2.filter(col("row_type") === "metadata").head()
    // first batch: 2+1 = 3; second: 3 + (2-1) = 4
    assert(meta.getAs[Int]("number_of_articles") == 4)
  }

  test("J2 lookup tolerates missing article payloads with stub columns") {
    val up = ClusterTable.upsertRows(ClusterTable.emptyTable(spark),
      assignments(("ghost", "c1", false, 1, 1)),
      articles(), clock)
    val row = up.filter(col("row_type") === "article").head()
    assert(row.getAs[String]("title") == "")
    assert(row.getAs[String]("SK") == "ARTICLE#ghost")
  }

  test("merge is last-writer-wins on (PK,SK)") {
    val t = Seq(
      ("c1", "#METADATA#c1", "metadata", "old")).toDF("PK", "SK", "row_type", "description")
    val up = Seq(
      ("c1", "#METADATA#c1", "metadata", "new")).toDF("PK", "SK", "row_type", "description")
    val merged = ClusterTable.merge(t, up)
    assert(merged.count() == 1)
    assert(merged.head().getAs[String]("description") == "new")
  }

  test("summarizePass fires per threshold, writes summary, bumps summary_count") {
    var t = ClusterTable.emptyTable(spark)
    val up = ClusterTable.upsertRows(t,
      assignments(
        ("a1", "c1", true, 3, 3), ("a2", "c1", true, 3, 3), ("a3", "c1", true, 3, 3),
        ("b1", "c2", false, 1, 1)),
      articles(
        ("a1", "T1", "S1", "X1", "2024-01-01 00:00:00"),
        ("a2", "T2", "S2", "X2", "2024-01-02 00:00:00"),
        ("a3", "T3", "S3", "X3", "2024-01-03 00:00:00"),
        ("b1", "U1", "V1", "Y1", "2024-01-04 00:00:00")), clock)
    t = ClusterTable.merge(t, up)
    val updated = Seq("c1", "c2").toDF("PK")
    // c1 has n=4 > 2*(0+1) → fires; c2 has n=2, not > 2 → no fire
    val t2 = ClusterTable.summarizePass(t, updated, threshold = 2)
    val m = t2.filter(col("row_type") === "metadata")
      .select("PK", "generated_summary", "summary_count", "description")
      .as[(String, String, Int, String)].collect()
      .map { case (pk, s, c, d) => pk -> ((s, c, d)) }.toMap
    assert(m("c1")._2 == 1)
    assert(m("c1")._1.startsWith("title: T1, summary: S1"))
    assert(m("c1")._3 == "T1")
    assert(m("c2") == (("", 0, "")))
  }

  test("A9 uiClusterList filters (is_cluster, summary, >2 dated) and sorts desc") {
    def meta(pk: String, n: Int, summary: String, isC: Boolean) =
      (pk, s"#METADATA#$pk", "metadata", n, summary, isC, null: String, null: String)
    def art(pk: String, id: String, date: String) =
      (pk, s"ARTICLE#$id", "article", 0, null: String, false, id, date)
    val t = Seq(
      meta("c1", 9, "sum1", true),
      art("c1", "a1", "2024-01-01"), art("c1", "a2", "2024-01-02"),
      art("c1", "a3", "2024-01-03"),
      meta("c2", 20, "", true),            // no summary → out
      art("c2", "b1", "2024-01-01"), art("c2", "b2", "2024-01-01"),
      art("c2", "b3", "2024-01-01"),
      meta("c3", 30, "sum3", false),       // not a cluster → out
      art("c3", "d1", "2024-01-01"), art("c3", "d2", "2024-01-01"),
      art("c3", "d3", "2024-01-01"),
      meta("c4", 40, "sum4", true),        // only 2 dated articles → out
      art("c4", "e1", "2024-01-01"), art("c4", "e2", "2024-01-01"),
      art("c4", "e3", null),
      meta("c5", 50, "sum5", true),
      art("c5", "f1", "2024-01-01"), art("c5", "f2", "2024-01-02"),
      art("c5", "f3", "2024-01-03"), art("c5", "f4", "2024-01-04"))
      .toDF("PK", "SK", "row_type", "number_of_articles", "generated_summary",
        "is_cluster", "article_id", "publication_date")
      .withColumn("description", lit(""))
      .withColumn("most_common_location", lit(""))
      .withColumn("most_common_organization", lit(""))
      .withColumn("earliest_date", lit(""))
      .withColumn("latest_date", lit(""))
    val out = ClusterTable.uiClusterList(t)
      .select("PK", "article_count").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("c5", 4L), ("c1", 3L)))
  }
}
