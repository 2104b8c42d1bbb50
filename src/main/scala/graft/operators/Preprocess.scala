package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashEmbed, TextFns}
import graft.schemas.Schemas

/** The stateless per-record stage of the news pipeline (SURVEY §2.2,
  * P1-P10): drop-list projection, text cleaning, field derivation,
  * embedding. Pure `DataFrame => DataFrame` — everything except the
  * embedding stub is built-in SQL functions, so the whole stage is one
  * whole-stage-codegen span with no shuffle.
  */
object Preprocess {

  /** P1 + P2 + P3 + P4 (reference `pre_process_docs.py:82-132`):
    * drop vendor fields, clean title, derive `summary` from cleaned text,
    * strip HTML from text, rename `date` → `publication_date`.
    */
  def preprocess(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val dropped = df.drop(Schemas.dropList.filter(present): _*)
    dropped
      .withColumn("title", TextFns.cleanText(col("title")))
      .withColumn("summary", TextFns.cleanText(col("text")))
      .withColumn("text", TextFns.removeTags(col("text")))
      // reference strips whitespace only (`pre_process_docs.py:118`)
      .withColumn("publication_date", trim(col("date")))
      .drop("date")
  }

  /** P9 in-batch dedup by id, first occurrence wins (reference
    * `process_records.py:69-96`). Deterministic: "first" = smallest value
    * of `orderCol` (the reference's arrival order; callers pass a
    * monotonic ingest column, or `id` itself for batch jobs).
    */
  def dedupById(df: DataFrame, orderCol: String = "id"): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P8 size guard (reference `embed_docs.py:100-102`): skip docs whose
    * serialized JSON exceeds the 256 KiB message limit.
    */
  def sizeGuard(df: DataFrame, maxBytes: Int = 262144): DataFrame =
    df.filter(octet_length(to_json(struct(df.columns.map(col): _*))) <= maxBytes)

  /** P6 + P7: concat title/summary/text and attach the embedding
    * (reference `embed_docs.py:30-42,70-95`). `concat_embedding` is
    * `array<float>` with ‖v‖₂=1 (we flatten the reference's pointless
    * `[[...]]` nesting, `embed_docs.py:97-98`).
    *
    * BATCHED, not per-row: each partition streams through
    * [[HashEmbed.embedPartition]] in ≤ `batchSize` chunks — the
    * reference's 200-article endpoint cap (`variables.tf:103-107`) — so
    * a real model gets one inference call per chunk. `embedder` is the
    * model seam; the default is the deterministic hashing stub.
    */
  def embed(df: DataFrame, dim: Int = HashEmbed.DefaultDim,
            batchSize: Int = HashEmbed.MaxBatch,
            embedder: (Seq[String], Int) => Seq[Array[Float]] = HashEmbed.embedBatch)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
    val withInput = df.withColumn("__embed_input",
      TextFns.concatForEmbedding(col("title"), col("summary"), col("text")))
    val inIdx = withInput.schema.fieldIndex("__embed_input")
    val outSchema = StructType(df.schema.fields :+
      StructField("concat_embedding", ArrayType(FloatType, containsNull = false)))
    withInput.mapPartitions { rows =>
      // buffer only one chunk at a time: zip the chunk back onto its rows
      rows.grouped(batchSize).flatMap { chunk =>
        val vecs = embedder(chunk.map(_.getString(inIdx)), dim)
        chunk.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq.patch(inIdx, Nil, 1) :+ v)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Full stateless stage: preprocess → dedup → guard → embed.
    * Dedup keeps the first occurrence in ARRIVAL order (reference
    * `process_records.py:69-96`): `monotonically_increasing_id` encodes
    * (partition, position) and source partitions preserve input order,
    * so min(__arrival) is the first-seen record.
    */
  def apply(raw: DataFrame, dim: Int = HashEmbed.DefaultDim): DataFrame = {
    val arrival = raw.withColumn("__arrival", monotonically_increasing_id())
    embed(sizeGuard(dedupById(preprocess(arrival), "__arrival").drop("__arrival")), dim)
  }
}
