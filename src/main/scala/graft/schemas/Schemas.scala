package graft.schemas

import org.apache.spark.sql.types._

/** Pinned StructTypes for the news-engine surface (SURVEY §1.2,
  * FIXTURES.md). The reference passes dynamic JSON through with a
  * drop-list; we fix the judge-facing schemas explicitly.
  */
object Schemas {

  /** Raw input article (reference `data/example_article.json:1-13`;
    * required-field contract `README.md:204-221`).
    */
  val rawArticle: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("event_id", StringType),
    StructField("duplicate", BooleanType),
    StructField("lang", StringType),
    StructField("bag_id", StringType),
    StructField("source", StringType),
    StructField("cluster", StringType)))

  /** The 20-field vendor drop-list (reference `pre_process_docs.py:85-106`). */
  val dropList: Seq[String] = Seq(
    "vendor_data", "headline_only", "deckline", "version", "story_link",
    "copyright_line", "display_date", "received_date", "publication_reason",
    "media", "spam", "control_flags", "issuer", "market",
    "business_relevance", "cluster_signature", "headline_cluster_signature",
    "signals", "cik", "feed")

  /** Entity arrays of the dormant rich schema
    * (reference `pre_process_docs.py:23-79`).
    */
  val entityArray: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("long_name", StringType),
    StructField("relevance", DoubleType))))

  /** Single clusters table mirroring the DynamoDB single-table design
    * (reference `iac/roots/main/main.tf:50-87`): metadata rows
    * (`SK = #METADATA#<PK>`) and article rows (`SK = ARTICLE#<id>`)
    * discriminated by `row_type`.
    */
  val clusters: StructType = StructType(Seq(
    StructField("PK", StringType, nullable = false),
    StructField("SK", StringType, nullable = false),
    StructField("row_type", StringType),
    // metadata columns (process_records.py:216-232 + summarization_pipeline.tf:37-55)
    StructField("created_at", StringType),
    StructField("number_of_articles", IntegerType),
    StructField("generated_summary", StringType),
    StructField("summary_count", IntegerType),
    StructField("description", StringType),
    StructField("is_cluster", BooleanType),
    StructField("most_common_location", StringType),
    StructField("most_common_organization", StringType),
    StructField("earliest_date", StringType),
    StructField("latest_date", StringType),
    // article columns (process_records.py:241-263)
    StructField("article_id", StringType),
    StructField("title", StringType),
    StructField("summary", StringType),
    StructField("text", StringType),
    StructField("organizations", ArrayType(StringType)),
    StructField("locations", ArrayType(StringType)),
    StructField("publication_date", StringType),
    StructField("entry_creation_date", StringType)))

  /** Cluster-pool state row (reference globals `process_records.py:34-48`:
    * `label_tracker` / `is_cluster` / `embeds`). `seq` is the stable pool
    * position — the reference's "first member index keeps the cluster
    * uuid" rule (`process_records.py:371-384`) becomes min-seq-wins.
    */
  val pool: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("cluster_id", StringType, nullable = false),
    // capped at Clustering.PoolIdCap — n_articles carries the true count
    // so a viral cluster can't grow one row without bound
    StructField("article_ids", ArrayType(StringType), nullable = false),
    StructField("n_articles", LongType, nullable = false),
    StructField("is_cluster", BooleanType, nullable = false),
    StructField("centroid", ArrayType(FloatType), nullable = false)))
}
