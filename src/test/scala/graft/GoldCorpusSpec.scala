package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.schemas.Schemas

/** S17 end-to-end: the clustering-quality gate the reference documents
  * but never automated (`README.md:205-219` — gold `event_id` labels on
  * the public corpus; quality = pairwise P/R/F1). A corpus-SHAPED
  * labeled fixture (shared boilerplate vocabulary, event-specific
  * keywords, per-article noise — NOT the a9 planted-token corpus, which
  * is ε-separated by construction) goes through the real pipeline
  * (loader → preprocess → batched embed → incremental clustering over
  * micro-batches) and `Fixtures.pairwiseQuality` must clear an F1 floor.
  */
class GoldCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val Events = 12
  private val Batches = 4

  /** Deterministic labeled corpus: per-event keyword vocabulary under a
    * heavy shared-boilerplate background. ~55% of tokens are event
    * keywords, ~35% boilerplate shared across ALL events, ~10% unique
    * noise — same-event cosine stays well above cross-event, but with a
    * real margin to cross, unlike the a9 plants.
    */
  private def goldCorpus(): Seq[Row] = {
    val rnd = new scala.util.Random(7)
    val boiler = Seq("the", "government", "said", "on", "monday", "officials",
      "reported", "that", "a", "statement", "was", "released", "after",
      "meeting", "in", "capital", "city", "press", "agency", "sources")
    (0 until Events).flatMap { e =>
      val kw = (0 until 8).map(j => s"ev${e}kw$j")
      val nArts = 3 + rnd.nextInt(6) // 3..8 articles per event
      (0 until nArts).map { i =>
        val toks = (0 until 60).map { _ =>
          val r = rnd.nextDouble()
          if (r < 0.55) kw(rnd.nextInt(kw.size))
          else if (r < 0.90) boiler(rnd.nextInt(boiler.size))
          else s"e${e}a${i}n${rnd.nextInt(1000)}"
        }
        Row(
          f"e$e%02da$i%d", // id
          toks.mkString(" "), // text
          s"${kw(i % kw.size)} coverage update $i", // title
          f"2024-03-${(e % 28) + 1}%02d 10:0$i:00", // date
          s"E$e", // gold event_id
          null, null,
          (i % Batches).toString, // bag_id = micro-batch tag
          "fixture", null)
      }
    }
  }

  test("pipeline F1 on the gold-labeled corpus clears the quality floor") {
    val dir = java.nio.file.Files.createTempDirectory("gold_corpus").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(goldCorpus(), 2), Schemas.rawArticle)
      .write.mode("overwrite").json(dir)

    // the S17 loader is part of the surface under test
    val corpus = Fixtures.loadLabeledCorpus(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gold = corpus.select(col("id"), col("event_id").as("label"))

    var pool = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.pool)
    for (b <- 0 until Batches) {
      val raw = corpus.filter(col("bag_id") === b.toString)
        .drop("event_id", "duplicate", "lang", "bag_id", "source", "cluster")
      val prepped = operators.Preprocess(raw, dim = 256)
      pool = Clustering.step(
        pool, prepped.select(col("id"), col("concat_embedding")),
        Clustering.Config(eps = GoldEps)).pool
    }

    val assigned = pool.select(
      explode(col("article_ids")).as("id"), col("cluster_id"))
    val q = Fixtures.pairwiseQuality(assigned, gold).head()
    val (p, r, f1) = (q.getAs[Double]("precision"),
      q.getAs[Double]("recall"), q.getAs[Double]("f1"))
    info(f"gold-corpus pairwise quality: precision $p%.3f recall $r%.3f f1 $f1%.3f")
    assert(f1 >= 0.90, f"pipeline F1 $f1%.3f below the 0.90 quality floor")
    corpus.unpersist()
  }

  /** ε for the gold corpus — the knob a reference deployment tunes per
    * corpus (the planted a9 corpus uses the 0.10 default; this vocabulary
    * mixture needs a wider ball). Measured on the fixture: same-event
    * pair distances run 0.24–0.62 (median 0.40), cross-event 0.51–1.0
    * (p5 0.80) — 0.45 sits under the cross-event minimum, so precision
    * stays exact while single-linkage closes most same-event pairs
    * transitively.
    */
  private val GoldEps = 0.45
}
