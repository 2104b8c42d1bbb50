package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest-side operators (SURVEY S1/S3, P10, P15, ST6): the envelope
  * decode + guard-rail stages that precede preprocessing.
  */
object Ingest {

  /** S3: base64 Kinesis-envelope decode → JSON text
    * (reference `pre_process_docs.py:135-143`).
    */
  def decodeBase64(c: Column): Column = unbase64(c).cast("string")

  /** P10: parse a JSON column against `schema`, silently skipping
    * malformed records (reference `process_records.py:72-75`
    * `json.JSONDecodeError → continue`). `requiredField` anchors the
    * validity test (PERMISSIVE mode yields a null field, not a null
    * struct, on corrupt input).
    */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType,
                requiredField: String = "id"): DataFrame =
    df.withColumn("__parsed", from_json(col(jsonCol), schema))
      .filter(col(s"__parsed.$requiredField").isNotNull)
      .select(col("*"), col("__parsed.*"))
      .drop("__parsed", jsonCol)

  /** The malformed side-output (the DLQ analog of S2). */
  def malformed(df: DataFrame, jsonCol: String, schema: StructType,
                requiredField: String = "id"): DataFrame =
    df.withColumn("__parsed", from_json(col(jsonCol), schema))
      .filter(col(s"__parsed.$requiredField").isNull)
      .drop("__parsed")

  /** P15: Kinesis ingest size predicates
    * (reference `put_records.py:23-32`) — 1 MB per record.
    */
  def recordSizeOk(c: Column, maxBytes: Int = 1048576): Column =
    octet_length(c) <= maxBytes

  /** ST6: chunk a static corpus into rate-simulation micro-batches of
    * `perBatch` rows in `orderCol` order (reference
    * `clustering.py:121-131` `prep_for_streaming`).
    */
  def rateChunks(df: DataFrame, perBatch: Int, orderCol: String): DataFrame =
    df.withColumn("__rn",
      row_number().over(Window.orderBy(col(orderCol))) - 1)
      .withColumn("batch", (col("__rn") / perBatch).cast("int"))
      .drop("__rn")
}
