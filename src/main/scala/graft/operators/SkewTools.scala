package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins whose hot keys overwhelm a
  * single shuffle partition.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`, on by
  * default in every graft session) is the first line of defense — it
  * splits oversized SORT-MERGE partitions at runtime. Salting remains
  * the right tool where AQE cannot reach: shuffled HASH joins, skew on
  * the build side of a join AQE planned non-adaptively, or a stable
  * plan shape needed for a streaming query (AQE re-plans per
  * micro-batch; a salted plan is deterministic).
  *
  * Mechanics: every `facts` row gets a deterministic salt in
  * [0, salts); every `dim` row is replicated `salts` times. The join
  * key becomes (key, salt), so one hot key spreads over `salts`
  * shuffle partitions at the cost of a `salts`× blow-up of the dim
  * side — the standard trade, correct when dim ≪ facts (the only
  * regime where skew hurts anyway).
  */
object SkewTools {

  /** Inner equi-join of a skewed fact table against a small dimension,
    * salted `salts` ways.
    *
    * The salt is `xxhash64` of the whole fact row — deterministic under
    * task retry (no rand()/monotonic id, which change on recompute and
    * would break exactly-once sinks). Byte-identical fact rows land on
    * the same salt, which is harmless: they carry the same key either
    * way.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val factCols: Seq[Column] = facts.columns.toIndexedSeq.map(col)
    val f = facts.withColumn("__salt",
      pmod(xxhash64(struct(factCols: _*)), lit(salts)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
