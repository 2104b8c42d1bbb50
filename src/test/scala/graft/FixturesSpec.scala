package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Preprocess}
import graft.schemas.Schemas

class FixturesSpec extends SparkSpec {
  import spark.implicits._

  test("S17 loader reads the labeled-corpus shape with gold labels") {
    val dir = Files.createTempDirectory("graft-fixture").toString
    val lines = Seq(
      """{"id":"a1","text":"storm hits coast","title":"Storm","date":"2024-01-01 10:00:00","event_id":"e1","cluster":"c1","lang":"en"}""",
      """{"id":"a2","text":"storm update coast","title":"Storm 2","date":"2024-01-01 11:00:00","event_id":"e1","cluster":"c1"}""")
    Files.writeString(Paths.get(dir, "corpus.json"), lines.mkString("\n"))
    val df = Fixtures.loadLabeledCorpus(spark, dir)
    assert(df.count() == 2)
    assert(df.schema.fieldNames.contains("event_id"))
    assert(df.filter(col("cluster") === "c1").count() == 2)
  }

  test("end-to-end clustering quality on a planted labeled corpus is perfect") {
    // 4 gold clusters, 5 members each, distinctive vocabulary per cluster
    val arts = for (g <- 0 until 4; i <- 0 until 5) yield {
      val word = s"topic$g"
      (f"a$g$i", s"$word $word $word $word $word extra$i", s"Title $g $i",
        "2024-01-01 10:00:00", s"gold$g")
    }
    val raw = arts.toDF("id", "text", "title", "date", "event_id")
    val prepped = Preprocess(raw, dim = 128)
    val step = Clustering.step(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.pool),
      prepped.select(col("id"), col("concat_embedding")))
    val assigned = step.assignments.select(col("article_id").as("id"), col("cluster_id"))
    val gold = raw.select(col("id"), col("event_id").as("label"))
    val q = Fixtures.pairwiseQuality(assigned, gold).head()
    assert(q.getAs[Double]("precision") == 1.0)
    assert(q.getAs[Double]("recall") == 1.0)
    assert(q.getAs[Double]("f1") == 1.0)
  }
}
