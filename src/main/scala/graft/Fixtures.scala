package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schemas.Schemas

/** S17: loader for the labeled public-corpus shape (the reference pulls
  * the SUMMA/Priberam news-clustering corpus, `data/
  * download_public_data.sh:1-2`; records carry gold `event_id`/`cluster`
  * labels, `README.md:205-219`) plus the clustering-quality metric the
  * reference never automated (SURVEY §5).
  */
object Fixtures {

  /** Read a labeled corpus file/dir (JSON-lines, rawArticle schema —
    * `id`, `text`, `title`, `date` + gold `event_id`/`cluster`).
    */
  def loadLabeledCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rawArticle).json(path)

  /** Pairwise clustering quality against gold labels.
    *
    * @param assigned (id, cluster_id) — engine output
    * @param gold     (id, label) — corpus gold clusters
    * @return one row: (tp, predicted_pairs, gold_pairs, precision,
    *         recall, f1) over unordered same-cluster pairs
    */
  def pairwiseQuality(assigned: DataFrame, gold: DataFrame): DataFrame = {
    def pairs(df: DataFrame, key: String): DataFrame =
      df.as("x").join(df.as("y"), col(s"x.$key") === col(s"y.$key"))
        .filter(col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b"))

    val pred = pairs(assigned.select(col("id"), col("cluster_id")), "cluster_id")
    val gp = pairs(gold.select(col("id"), col("label")), "label")
    val tp = pred.join(gp, Seq("a", "b"), "left_semi")

    val spark = assigned.sparkSession
    import spark.implicits._
    val (nTp, nPred, nGold) = (tp.count(), pred.count(), gp.count())
    val p = if (nPred == 0) 0.0 else nTp.toDouble / nPred
    val r = if (nGold == 0) 0.0 else nTp.toDouble / nGold
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    Seq((nTp, nPred, nGold, p, r, f1))
      .toDF("tp", "predicted_pairs", "gold_pairs", "precision", "recall", "f1")
  }
}
