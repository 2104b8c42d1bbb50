package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; these helpers
  * centralize the parquet paths so filter/column pruning reaches the scan
  * (plain `spark.read.parquet` — Catalyst handles pushdown).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.ts has shipped as both parquet TIMESTAMP(MICROS) (reads as a
    * Spark timestamp directly) and TIMESTAMP(NANOS) (rejected by the
    * vectorized reader; surfaces as a raw nanos LONG under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set once at session
    * setup by [[GraftExtensions.register]]). Branch on the type the scan
    * actually produced: a long is nanos to truncate to microseconds
    * (exactly DuckDB's ns→µs conversion, so oracles agree); a timestamp
    * passes through untouched. The conf itself is deliberately NOT set
    * here: a loader mutating session conf mid-flight changes how every
    * other TIMESTAMP(NANOS) parquet reads for the rest of the session
    * and races concurrent queries (ADVICE r2).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(load(spark, sfDir, "events"))

  /** The events table as a file STREAM (schema pinned from the batch
    * read; a direct parquet file path is a valid file-source glob).
    * Same ts normalization as the batch form, so stream and batch
    * operators see the identical event-time column.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    normalizeEventTs(
      spark.readStream.schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
        // deliberately a GLOB, not the plain file path: FileStreamSource
        // force-sets basePath to the source path itself for non-glob
        // paths, and a basePath that is a FILE fails partition inference
        // in getBatch; with a glob it leaves basePath to be inferred
        // from the matched files' parent directory
        .parquet(s"$sfDir/events.parque[t]"))
  }

  private def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // pandas-written parquet is tz-naive; downstream operators use
        // unix_micros/window() which require TIMESTAMP. Session tz is UTC
        // (set at session setup), so the cast preserves the instant and
        // matches DuckDB's naive-timestamp reading bit-for-bit.
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register all tables as temp views so `spark.sql` text matches the
    * DuckDB oracle SQL (same table names).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
