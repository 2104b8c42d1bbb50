package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + fixed shard layout — the last mile of
  * a training-data pipeline: every pretraining run wants the corpus in
  * a REPRODUCIBLE pseudo-random order, split into shards a loader can
  * consume independently (reference analog: none — the news pipeline
  * stops at the serving table; this is part of the training-data
  * surface the brief mandates).
  *
  * Shard and order both derive from one portable key,
  * `md5("<seed>:<id>")`: shard = first-8-hex-chars u32 mod `nShards`,
  * in-shard position = rank by `(key, id)`. The permutation is a pure
  * function of (seed, id) — rerunning, re-partitioning, or growing the
  * cluster never changes the layout, and an external engine (the DuckDB
  * oracle) reproduces it from the same strings.
  *
  * At 100 TB this is ONE hash shuffle on the shard id plus a per-shard
  * local sort (the window below plans as Exchange(hashpartitioning) +
  * in-partition Sort) — never a global sort/range exchange: shards are
  * mutually independent, so no total order across shards is computed.
  * Pick `nShards` ≈ corpus / target-shard-bytes; the ShardingSpec plan
  * pin asserts the no-range-exchange property.
  */
object Sharding {

  private def u32(hexCol: Column): Column =
    conv(substring(hexCol, 1, 8), 16, 10).cast("long")

  /** One row per input row: `(<idCol>, shard, pos)` — `shard` in
    * `[0, nShards)`, `pos` the 1-based position within the shard under
    * the deterministic pseudo-random order.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    seed: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(!Set("shard", "pos").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    // rename the id FIRST so internal working names can never collide
    // with a caller column (the ADVICE-r5 convention: only declared
    // output names are reserved)
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("__key"), col("__id"))
    df.select(col(idCol).as("__id"))
      .withColumn("__key", md5(concat(lit(s"$seed:"), col("__id").cast("string"))))
      .withColumn("__shard", (u32(col("__key")) % nShards).cast("int"))
      .withColumn("__pos", row_number().over(w))
      .select(col("__id").as(idCol), col("__shard").as("shard"),
        col("__pos").as("pos"))
  }
}
