package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.HashEmbed
import graft.schemas.Schemas
import graft.streaming.StreamingPipeline

/** Golden-shape fixture from the reference's REAL state dump (SURVEY §5:
  * `business_logic/temp.json` — a `label_tracker` snapshot of
  * cluster-uuid → article-id lists from an actual run). The dump becomes
  * a committed pool state version; a micro-batch then processes ON TOP
  * of it through the real restore path (`processBatch` reads v0 exactly
  * like a crash-recovery would), and the result must preserve every
  * invariant a production operator relies on: no article lost, no
  * cluster membership rewritten, the cluster/singleton split intact.
  *
  * Skips (cancel, not fail) when the reference checkout is absent so
  * the suite stays portable.
  */
class LabelTrackerFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val DumpPath = "/root/reference/business_logic/temp.json"

  test("label_tracker dump restores as pool state and survives a batch") {
    assume(Files.exists(Paths.get(DumpPath)), s"reference dump not present")
    val raw = Files.readString(Paths.get(DumpPath))

    // the dump is a Python repr: [('uuid', ['article_id', ...]), ...]
    val entryRe = """\('([0-9a-f\-]{36})',\s*\[([^\]]*)\]\)""".r
    val idRe = """'([^']+)'""".r
    val parsed: Seq[(String, Seq[String])] =
      entryRe.findAllMatchIn(raw).map { m =>
        (m.group(1), idRe.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq)
      }.toSeq

    // golden-shape pins: the dump is a fixed artifact, so its observed
    // structure IS the contract (975 labels over 983 unique articles;
    // 8 two-member clusters, everything else singleton)
    assert(parsed.length == 975)
    val allIds = parsed.flatMap(_._2)
    assert(allIds.length == 983 && allIds.distinct.length == 983)
    assert(parsed.map(_._1).distinct.length == 975)
    assert(parsed.count(_._2.length > 1) == 8)
    assert(parsed.forall(_._2.nonEmpty))

    // dump → Schemas.pool rows; centroids are deterministic hash
    // embeddings (the dump carries no vectors — shape is under test)
    val cfg = StreamingPipeline.Config()
    val pool0 = parsed.zipWithIndex.map { case ((cid, ids), i) =>
        (i + 1L, cid, ids, ids.length.toLong, ids.length > 1)
      }.toDF("seq", "cluster_id", "article_ids", "n_articles", "is_cluster")
      .withColumn("centroid",
        HashEmbed.embedColumn(concat_ws(" ", col("article_ids")), cfg.embedDim))
      .select(Schemas.pool.fieldNames.map(col).toSeq: _*)

    val root = Files.createTempDirectory("ltfix").toString
    pool0.write.parquet(s"$root/state/pool/v0")

    // a fresh micro-batch on top of the restored state — synthetic text
    // embeds nowhere near the hash centroids (random-unit-vector cosine
    // distance ≈ 1 ≫ eps), so the two new articles must come out as two
    // new singletons and every dump label must pass through untouched
    StreamingPipeline.processBatch(
      Seq(
        ("B0001", "fresh breaking report about alpha", "t1", "2024-01-05 00:00:00"),
        ("B0002", "completely different beta story", "t2", "2024-01-05 00:01:00"))
        .toDF("id", "text", "title", "date"),
      1L, s"$root/state", cfg)

    val pool1 = spark.read.parquet(s"$root/state/pool/v1")

    // Σ ids preserved: all 983 dump articles + the 2 new ones
    val ids1 = pool1.select(explode(col("article_ids")).as("id"))
      .as[String].collect()
    assert(ids1.length == 985 && ids1.distinct.length == 985)
    assert(allIds.forall(ids1.toSet.contains))
    assert(ids1.toSet.contains("B0001") && ids1.toSet.contains("B0002"))

    // cluster/singleton split: 8 clusters, 967 + 2 singletons
    val splits = pool1.groupBy(col("is_cluster")).count()
      .as[(Boolean, Long)].collect().toMap
    assert(splits(true) == 8L, s"split $splits")
    assert(splits(false) == 969L, s"split $splits")

    // membership identity: every dump label keeps its exact id list
    val byLabel = pool1.filter(!col("cluster_id").startsWith("B"))
      .select(col("cluster_id"), col("article_ids"))
      .as[(String, Seq[String])].collect()
      .filter { case (cid, _) => parsed.exists(_._1 == cid) }.toMap
    assert(byLabel.size == 975)
    parsed.foreach { case (cid, ids) =>
      assert(byLabel(cid).sorted == ids.sorted, s"membership drift in $cid")
    }

    // the table version published by the batch carries exactly the two
    // new articles (upserts are per-changed-cluster, dump labels slept)
    val table1 = StreamingPipeline.latestTable(spark, s"$root/state")
    val arts = table1.filter(col("row_type") === "article")
      .select(col("SK")).as[String].collect()
    assert(arts.toSet == Set("ARTICLE#B0001", "ARTICLE#B0002"))
  }
}
