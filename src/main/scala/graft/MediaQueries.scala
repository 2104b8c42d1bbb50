package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Summarize, TemporalJoins}

/** Multimodal media table: binary payloads + typed metadata. The
  * SQL-checkable surface is the metadata/content-hash projection; the
  * batched decode/feature operators are covered by MultimodalSpec.
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multimodal exact dedup — d1's decision on the BINARY payload
    // column: group by (modality, payload md5), keep-first, copy count.
    // The exchange key is the 16-byte digest, never the payload itself
    // (at 100 TB the media bytes stay in place; only digests shuffle —
    // the same digest-key discipline as d10/d17). Planted copies ride
    // at doc_id + 999999 (divisible by 3, so a copy keeps its
    // modality and the duplicate groups are non-vacuous).
    "m4_payload_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val dup = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 999999).as("doc_id"), col("text"))
      graft.operators.Multimodal.mediaFrom(docs.unionByName(dup))
        .groupBy(col("modality"), md5(col("payload")).as("content_md5"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("modality"), col("keep_id"))
    }),

    // Container-format sniffing + declared-vs-actual audit: every
    // media-lake ingest validates that the catalog's declared modality
    // matches the payload's MAGIC BYTES (a mislabeled row sends a video
    // through an image codec at best, an exploit path at worst). Real
    // 4-byte magics (PNG / RIFF / ftyp) are prepended to the synthetic
    // payloads, with every 20th doc planted WRONG so the audit is
    // non-vacuous; the sniff is a pure map-side binary-prefix compare
    // (zero shuffles before the presentation sort — no byte ever
    // leaves its partition). The oracle re-sniffs via hex() because
    // DuckDB 1.0 has no BLOB substring — same bytes, same verdicts.
    "m5_magic_sniff" -> ((s, dir) => {
      val magics = array(
        lit(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
        lit("RIFF".getBytes("US-ASCII")),
        lit("ftyp".getBytes("US-ASCII")))
      val names = array(lit("image"), lit("audio"), lit("video"))
      val mi = when(col("doc_id") % 20 === 0, (col("doc_id") % 3 + 1) % 3)
        .otherwise(col("doc_id") % 3).cast("int")
      val payload = concat(element_at(magics, mi + 1),
        col("text").cast("binary"))
      val prefix = substring(payload, 1, 4)
      val sniffed = when(prefix === element_at(magics, 1), "image")
        .when(prefix === element_at(magics, 2), "audio")
        .when(prefix === element_at(magics, 3), "video")
        .otherwise("unknown")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          element_at(names, (col("doc_id") % 3 + 1).cast("int")).as("declared"),
          sniffed.as("sniffed"))
        .withColumn("consistent", col("declared") === col("sniffed"))
        .orderBy(col("doc_id"))
    }),

    // Z-order (Morton) layout clustering — functions/ZInterleaveExpr,
    // a native codegen Expression. Sorting/range-partitioning by
    // z = interleave(x, y) is how a 100 TB table gets MULTI-dimension
    // scan pruning from per-file min/max stats (a lexicographic sort
    // only prunes the leading column). Each z-tile (z div 1024 = a
    // 32×32 tile of the key space) provably bounds BOTH dims; the
    // report emits the per-tile min/max extents — exactly the file-
    // statistics a writer laying out by z would publish to the
    // pruning index. Pure int64 mask arithmetic, replayed bit-for-bit
    // by the oracle's identical mask chain.
    "m6_zorder_cluster" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .withColumn("z",
          graft.functions.ZInterleaveExpr(col("user_id"), col("k")))
        .withColumn("tile", expr("z div 1024"))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("tile"))),

    "m1_media_meta" -> ((s, dir) =>
      graft.operators.Multimodal.mediaFrom(Tables.documents(s, dir))
        .select(
          col("doc_id"),
          col("modality"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          col("meta.format").as("format"),
          col("meta.width").as("width"))
        .orderBy(col("doc_id"))),

    // media shard packing (the multimodal t7): payloads bin-packed into
    // 16 KiB shards PER MODALITY by cumulative byte size — the training-
    // loader layout step for image/audio/video corpora. Same two-level
    // prefix sum as t7 (per-(modality, chunk) windows + broadcast chunk
    // offsets), so the only ordered pass over whole modalities runs on
    // #chunks rows; a flat per-modality window would drag every row of
    // a modality through ONE partition at 100 TB.
    "m3_media_pack" -> ((s, dir) => {
      val base = graft.operators.Multimodal.mediaFrom(Tables.documents(s, dir))
        .select(col("doc_id"), col("modality"),
          octet_length(col("payload")).cast("long").as("n_bytes"))
        .withColumn("chunk", floor(col("doc_id") / 1000).cast("long"))
      val chunkW = Window.partitionBy(col("modality")).orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = base.groupBy(col("modality"), col("chunk"))
        .agg(sum(col("n_bytes")).as("ctot"))
        .withColumn("coffset", sum(col("ctot")).over(chunkW) - col("ctot"))
        .select(col("modality"), col("chunk"), col("coffset"))
      val inW = Window.partitionBy(col("modality"), col("chunk"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.join(broadcast(offsets), Seq("modality", "chunk"))
        .withColumn("cum", sum(col("n_bytes")).over(inW) + col("coffset"))
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          floor((col("cum") - col("n_bytes")) / 16384).cast("long").as("shard"))
        .orderBy(col("doc_id"))
    }),

    // SHARD-INDEXED POINT EXTRACTION — the serving half of m3's packing
    // (the WebDataset random-access pattern): the pack layout yields a
    // member index (modality, shard, offset-in-shard, length); shard
    // BLOBS are assembled once (members concatenated in doc order —
    // one exchange on the shard key, blobs never move again); a point
    // read joins the index for its target ids and slices the member
    // straight out of its shard blob. The md5 of the EXTRACTED bytes
    // is the output — if any offset/length/assembly step were wrong,
    // the hash would not match the oracle's md5 of the source payload.
    // ASCII corpus ⇒ byte slice ≡ char slice (m2's documented caveat).
    // At 100 TB: extraction touches only the target ids' shards (the
    // index join prunes), and a real deployment persists blobs + index
    // at pack time — this query exercises the whole round trip.
    "m7_shard_extract" -> ((s, dir) => {
      val m = graft.operators.Multimodal.mediaFrom(Tables.documents(s, dir))
        .select(col("doc_id"), col("modality"),
          col("payload").cast("string").as("body"))
        .withColumn("n_bytes", octet_length(col("body")).cast("long"))
      val cumW = Window.partitionBy(col("modality")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val idx = m
        .withColumn("cum", sum(col("n_bytes")).over(cumW))
        .withColumn("shard",
          floor((col("cum") - col("n_bytes")) / 16384).cast("long"))
      val inW = Window.partitionBy(col("modality"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val indexed = idx.withColumn("off_in",
        (sum(col("n_bytes")).over(inW) - col("n_bytes")).cast("long"))
      val blobs = indexed.groupBy(col("modality"), col("shard"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("body")))),
          x => x.getField("body")), "").as("blob"))
      indexed.filter(col("doc_id") % 97 === 3)
        .select(col("doc_id"), col("modality"), col("shard"),
          col("off_in"), col("n_bytes"))
        .join(blobs, Seq("modality", "shard"))
        .select(col("doc_id"), col("modality"), col("shard"), col("off_in"),
          col("n_bytes"),
          md5(col("blob").substr((col("off_in") + 1).cast("int"),
            col("n_bytes").cast("int"))).as("member_md5"))
        .orderBy(col("doc_id"))
    }),

    // frame sampling over the video modality: every 4th 32-byte chunk of
    // the payload is one "frame" (deterministic demux stub — the Spark
    // side is the real mapPartitions dataflow a codec would plug into).
    // Oracle parity relies on the corpus being ASCII (byte slice ≡ char
    // slice; DuckDB 1.0 has no BLOB substring) — m1's whole-payload md5
    // covers the non-sliced contract.
    "m2_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = graft.operators.Multimodal
        .mediaFrom(Tables.documents(s, dir))
        .as[graft.operators.Multimodal.MediaRow]
      graft.operators.Multimodal.sampleFrames(media)
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_len"),
          md5(col("frame")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }))

  val oracleSql: Map[String, String] = Map(
    "m7_shard_extract" ->
      // the index math replayed (m3's running-sum layout + the
      // within-shard offset); the md5 is of the SOURCE payload — equal
      // to Spark's md5 of the blob slice only if every offset, length
      // and assembly step was exact
      """WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |  text AS body,
        |  octet_length(encode(text))::BIGINT AS n_bytes
        |FROM documents),
        |c AS (SELECT *, sum(n_bytes) OVER (PARTITION BY modality ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM m),
        |s AS (SELECT *, CAST(floor((cum - n_bytes) / 16384) AS BIGINT) AS shard
        |      FROM c),
        |o AS (SELECT *, CAST(sum(n_bytes) OVER (PARTITION BY modality, shard
        |        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        - n_bytes AS BIGINT) AS off_in FROM s)
        |SELECT doc_id, modality, shard, off_in, n_bytes, md5(body) AS member_md5
        |FROM o WHERE doc_id % 97 = 3 ORDER BY doc_id""".stripMargin,
    "m3_media_pack" ->
      """WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text))::BIGINT AS n_bytes
        |FROM documents),
        |c AS (SELECT *, sum(n_bytes) OVER (PARTITION BY modality ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM m)
        |SELECT doc_id, modality, n_bytes,
        |  CAST(floor((cum - n_bytes) / 16384) AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,
    "m2_frame_sample" ->
      """WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
        |n AS (SELECT doc_id, text,
        |      greatest(length(text) // 32, 1) AS nf FROM v),
        |f AS (SELECT doc_id,
        |      unnest(generate_series(0, nf - 1, 4)) AS frame_idx, text FROM n)
        |SELECT doc_id, frame_idx::INT AS frame_idx,
        |  length(substring(text, frame_idx * 32 + 1, 32))::INT AS frame_len,
        |  md5(substring(text, frame_idx * 32 + 1, 32)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m4_payload_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 999999, text FROM documents WHERE doc_id % 10 = 0),
        |m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |  md5(text) AS content_md5 FROM corpus)
        |SELECT modality, content_md5, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM m GROUP BY modality, content_md5
        |ORDER BY modality, keep_id""".stripMargin,
    "m5_magic_sniff" ->
      """WITH m AS (SELECT doc_id, text,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS declared,
        |  CAST(CASE WHEN doc_id % 20 = 0 THEN (doc_id % 3 + 1) % 3
        |            ELSE doc_id % 3 END AS INT) AS mi
        |  FROM documents),
        |p AS (SELECT doc_id, declared,
        |  (['\x89PNG'::BLOB, 'RIFF'::BLOB, 'ftyp'::BLOB][mi + 1] || text::BLOB)
        |    AS payload FROM m)
        |SELECT doc_id, declared,
        |  CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image'
        |       WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'audio'
        |       WHEN substring(hex(payload), 1, 8) = '66747970' THEN 'video'
        |       ELSE 'unknown' END AS sniffed,
        |  declared = (CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image'
        |       WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'audio'
        |       WHEN substring(hex(payload), 1, 8) = '66747970' THEN 'video'
        |       ELSE 'unknown' END) AS consistent
        |FROM p ORDER BY doc_id""".stripMargin,
    "m6_zorder_cluster" -> {
      val z = graft.functions.ZInterleaveExpr.interleaveSql("user_id", "k")
      s"""WITH e AS (SELECT user_id,
         |  CAST(json_extract(props, '$$.k') AS INT) AS k FROM events),
         |z AS (SELECT user_id, k, $z AS z FROM e)
         |SELECT z // 1024 AS tile, count(*) AS n,
         |  min(user_id) AS min_u, max(user_id) AS max_u,
         |  min(k) AS min_k, max(k) AS max_k
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin
    },
    "m1_media_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
        |  CAST(16 + doc_id % 64 AS INT) AS width
        |FROM documents ORDER BY doc_id""".stripMargin)
}
