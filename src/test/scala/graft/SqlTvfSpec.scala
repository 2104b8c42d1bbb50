package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** The SQL table-valued functions over the snapshot log:
  * `table_changes` equals the ChangeFeed API row-for-row, `snapshot_at`
  * time-travels and defaults to current, and non-literal arguments fail
  * at analysis with a readable message.
  */
class SqlTvfSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = {
    val t = SparkHygiene.scratchDir("tvf_tbl")
    Snapshots.commit(spark, t,
      (0L until 100L).map(i => (i, s"d$i")).toDF("id", "name"))
    Snapshots.commit(spark, t,
      (100L until 130L).map(i => (i, s"d$i")).toDF("id", "name"))
    t
  }

  test("table_changes equals the ChangeFeed API") {
    val t = table()
    val viaSql = spark.sql(
      s"SELECT id, name, _change_type FROM table_changes('$t', 1, 2, 'id')")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val viaApi = graft.operators.ChangeFeed.changes(spark, t, 1, 2, "id")
      .select($"id", $"name", $"_change_type")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.size == 30 && viaSql.forall(_._3 == "insert"))
  }

  test("snapshot_at pins a version; one-arg form reads current") {
    val t = table()
    assert(spark.sql(s"SELECT count(*) FROM snapshot_at('$t', 1)")
      .as[Long].head() == 100L)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_at('$t')")
      .as[Long].head() == 130L)
    // composes with ordinary SQL: join the two versions
    val grew = spark.sql(
      s"""SELECT count(*) FROM snapshot_at('$t') cur
         |LEFT ANTI JOIN snapshot_at('$t', 1) v1 ON cur.id = v1.id""".stripMargin)
      .as[Long].head()
    assert(grew == 30L)
  }

  test("non-literal arguments fail with a readable message") {
    val t = table()
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM snapshot_at('$t', (SELECT max(id) FROM range(2)))")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}
