package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history build — turn a change log into validity
  * intervals: one row per (key, state) VERSION with `valid_from`,
  * `valid_to` (null while current) and an `is_current` flag, the
  * dimension-history table behind every "what was this entity's state
  * at time t" join (which is then a plain `j8`-style interval join).
  *
  * Two window passes over ONE key exchange:
  *   1. lag() duplicate-collapse — an event that does not change the
  *      tracked state opens no new version;
  *   2. lead() close — each version's end is the next version's start.
  * Both windows share the same partitioning, so Catalyst plans a
  * single hash exchange; the whole history build moves each key across
  * the wire once regardless of version count, and per-key cost is the
  * sorted scan of that key's events — the same skew bound as any
  * windowed aggregate.
  *
  * Exercised under the oracle gate by `j17_scd2` (events table; oracle
  * is the identical lag/lead construction in ANSI SQL).
  *
  * @param log     change log
  * @param key     entity column name
  * @param state   tracked attribute column name
  * @param ts      event-time column name
  * @param tieBreak column that makes same-timestamp ordering
  *                deterministic (an event id)
  */
object Scd2 {

  /** @param carryTieBreak when true, the output keeps the `tieBreak`
    *        column of each version's OPENING change row — the unique
    *        version id downstream as-of joins need as a deterministic
    *        tie-break when two versions of a key could share a
    *        `valid_from` timestamp (ADVICE r11 / j19)
    */
  def intervals(log: DataFrame, key: String, state: String,
                ts: String, tieBreak: String,
                carryTieBreak: Boolean = false): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val byFrom = Window.partitionBy(col(key))
      .orderBy(col("valid_from"), col(tieBreak))
    val base = log
      .withColumn("__s_prev", lag(col(state), 1).over(byKey))
      .filter(col("__s_prev").isNull || col(state) =!= col("__s_prev"))
      .select(col(key), col(state), col(ts).as("valid_from"), col(tieBreak))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
    val cols = Seq(col(key), col(state), col("valid_from"), col("valid_to"),
      when(col("valid_to").isNull, lit(1)).otherwise(lit(0)).as("is_current")) ++
      (if (carryTieBreak) Seq(col(tieBreak)) else Nil)
    base.select(cols: _*)
  }
}
