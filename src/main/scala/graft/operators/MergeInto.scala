package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO — the lakehouse upsert statement (SQL:2003 MERGE; the
  * Delta/Iceberg `MERGE INTO target USING delta`) as a copy-on-write
  * plan:
  *
  *   - WHEN MATCHED AND op = delete  → row is dropped
  *   - WHEN MATCHED (otherwise)      → row is rewritten from the delta
  *   - WHEN NOT MATCHED AND not a delete → row is inserted
  *
  * The physical shape is the one that survives a 100 TB target: the
  * target relation is only ever the STREAM side of broadcast joins
  * against the (small) delta —
  *
  *   kept     = target LEFT ANTI broadcast(delta keys)
  *   updated  = target INNER broadcast(delta WHERE NOT delete)
  *   inserted = delta-upserts LEFT ANTI broadcast(updated keys)
  *
  * so the target is scanned but NEVER shuffled, and the "was this delta
  * row matched?" set needed by the insert branch is itself
  * delta-bounded (the keys that survived the update join), so the
  * insert branch joins two small relations. The only exchange a caller
  * pays is whatever they do with the result. Table formats implement
  * exactly this dataflow per touched file; here it is expressed once
  * over DataFrames so any keyed snapshot can be merged.
  *
  * Exercised under the oracle gate by `j16_merge_upsert` (oracle: the
  * equivalent three-branch FULL OUTER decomposition in ANSI SQL).
  *
  * Reference anchor: the reference's upsert consumer
  * (business_logic/clustering/dynamodb_utils.py batch-write path)
  * resolves matched-vs-new rows against the cluster table the same
  * three-way way, imperatively per item; this is the set-at-once form.
  */
object MergeInto {

  /** @param target    the big keyed snapshot
    * @param delta     the small change feed; its key column is `key`
    *                  renamed away internally — its OTHER column names
    *                  must not collide with target's (rename first)
    * @param key       equi-join key column name, present on both sides
    * @param deleteWhen predicate over delta columns marking delete rows
    * @param updateCols the output row for matched (non-delete) rows, as
    *                  (name → expr over target + delta cols); names
    *                  must equal the target schema
    * @param insertCols the output row for unmatched upsert delta rows
    * @param tag       when set, append a column of this name holding
    *                  which branch emitted the row (kept/updated/inserted)
    */
  def apply(target: DataFrame, delta: DataFrame, key: String,
            deleteWhen: Column,
            updateCols: Seq[(String, Column)],
            insertCols: Seq[(String, Column)],
            tag: Option[String] = None): DataFrame = {
    val outNames = target.columns.toSeq
    require(updateCols.map(_._1) == outNames && insertCols.map(_._1) == outNames,
      s"update/insert column lists must produce the target schema ${outNames.mkString(",")}")
    def tagged(df: DataFrame, branch: String): DataFrame =
      tag.fold(df)(t => df.withColumn(t, lit(branch)))
    val dKey = delta.select(col(key).as("__m_dkey"))
    val kept = tagged(
      target.join(broadcast(dKey), col(key) === col("__m_dkey"), "left_anti"),
      "kept")
    val upserts = delta.filter(!deleteWhen).withColumnRenamed(key, "__m_dkey")
    // inner join resolves matched rows; updateCols decides which side wins
    val updated = tagged(
      target.join(broadcast(upserts), col(key) === col("__m_dkey"))
        .select(updateCols.map { case (n, c) => c.as(n) }: _*),
      "updated")
    val matchedKeys = updated.select(col(key).as("__m_mkey"))
    val inserted = tagged(
      upserts.join(broadcast(matchedKeys),
          col("__m_dkey") === col("__m_mkey"), "left_anti")
        .withColumnRenamed("__m_dkey", key)
        .select(insertCols.map { case (n, c) => c.as(n) }: _*),
      "inserted")
    kept.unionByName(updated).unionByName(inserted)
  }
}
