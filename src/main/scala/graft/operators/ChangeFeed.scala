package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** CHANGE DATA FEED between two snapshot versions — Delta's
  * `table_changes` semantics derived from the manifest log alone: a
  * row-level diff `(row, _change_type ∈ insert | delete |
  * update_preimage | update_postimage)` of any two committed versions
  * of a snapshot table (reference analog: the streaming pipeline's CDC
  * feed gives FORWARD per-batch changes as they happen;
  * this gives the change set between ANY two versions after the fact —
  * the audit/backfill form).
  *
  * The scale lever is the UNCHANGED-FILE fast path: data files are
  * immutable and manifests reference them (never rewrite them), so a
  * file listed by BOTH versions cannot contain a changed row — only
  * the manifest DIFF is ever scanned. An append commit diffs as just
  * the appended directory (pure inserts, zero old bytes read); a
  * copy-on-write erase diffs as the touched originals vs their
  * rewrites (survivors cancel out by full-row hash). One shuffle, keyed
  * on the table's primary key, over diff-sized inputs — never
  * O(table).
  *
  * Precondition: `keyCol` is unique per version (a primary key) — the
  * same contract Delta's CDF update pairing has. Survivor rows
  * (same key, same content on both sides) are dropped by an xxhash64
  * full-row comparison; same key with different content emits the
  * update pre/post image pair.
  */
object ChangeFeed {

  def changes(spark: SparkSession, tableDir: String,
              fromVersion: Int, toVersion: Int,
              keyCol: String): DataFrame = {
    require(fromVersion > 0 && toVersion > 0 && fromVersion != toVersion,
      s"need two distinct committed versions, got $fromVersion → $toVersion")
    val fromFiles = filesOf(spark, tableDir, fromVersion)
    val toFiles = filesOf(spark, tableDir, toVersion)
    val removed = (fromFiles -- toFiles).toSeq.sorted
    val added = (toFiles -- fromFiles).toSeq.sorted

    // schema from the `to` side (schema is stable across versions of a
    // table; the empty-side frames still need it)
    val proto = Snapshots.read(spark, tableDir, Some(toVersion))
    val cols = proto.columns.toSeq
    require(cols.contains(keyCol), s"no '$keyCol' column in $tableDir")
    def sideOf(paths: Seq[String]): DataFrame = {
      val base = if (paths.isEmpty) proto.limit(0)
                 else spark.read.parquet(paths: _*).select(cols.map(col): _*)
      base.withColumn("__h", xxhash64(cols.map(col): _*))
    }
    val pre = sideOf(removed).as("p")
    val post = sideOf(added).as("q")
    val joined = pre.join(post,
      col(s"p.$keyCol") === col(s"q.$keyCol"), "full_outer")
    val deletes = joined.filter(col(s"q.$keyCol").isNull)
      .select(cols.map(c => col(s"p.$c")) :+ lit("delete").as("_change_type"): _*)
    val inserts = joined.filter(col(s"p.$keyCol").isNull)
      .select(cols.map(c => col(s"q.$c")) :+ lit("insert").as("_change_type"): _*)
    val updated = joined.filter(col(s"p.$keyCol").isNotNull &&
      col(s"q.$keyCol").isNotNull && col("p.__h") =!= col("q.__h"))
    val updPre = updated
      .select(cols.map(c => col(s"p.$c")) :+
        lit("update_preimage").as("_change_type"): _*)
    val updPost = updated
      .select(cols.map(c => col(s"q.$c")) :+
        lit("update_postimage").as("_change_type"): _*)
    deletes.unionByName(inserts).unionByName(updPre).unionByName(updPost)
  }

  /** A version's parquet files (scheme-less paths), manifest-resolved. */
  private def filesOf(spark: SparkSession, tableDir: String,
                      version: Int): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Snapshots.manifestEntries(tableDir, version).flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toUri.getPath)
      else Seq(p.toUri.getPath)
    }.toSet
  }
}
