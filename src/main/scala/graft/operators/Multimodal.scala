package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `binary` payloads with a typed metadata struct, and
  * per-modality operators run as BATCHED partition transforms — the
  * Scala/Tungsten analog of `mapInPandas` (fixed-size chunks inside each
  * partition, no per-row overhead, bounded memory).
  *
  * The actual codecs are STUBBED (no image/audio libraries ship in this
  * environment): [[Multimodal.decodePixels]] is the clearly-marked
  * boundary — it derives a deterministic fake pixel buffer from the
  * payload so every downstream contract (schema, batch shape,
  * partitioning, feature vectors) is real and testable. Swap that one
  * function for a real codec and nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       sampleRate: Int, nFrames: Int)

  case class MediaRow(doc_id: Long, modality: String,
                      payload: Array[Byte], meta: MediaMeta)

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           channels: Int, histogram: Array[Float])

  case class FrameSample(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic media table derived from `documents` (the driver
    * environment has no real media fixtures): payload = utf-8 bytes,
    * modality round-robins image/audio/video, metadata varies by id.
    */
  def mediaFrom(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(16) + col("doc_id") % 64).cast("int").as("width"),
        (lit(16) + col("doc_id") % 48).cast("int").as("height"),
        lit(16000).cast("int").as("sampleRate"),
        (lit(8) + col("doc_id") % 24).cast("int").as("nFrames")).as("meta"))

  // ------------------------------------------------------------------
  // STUB BOUNDARY: a real build links an image codec here. The fake is
  // deterministic in (payload, meta) so tests and goldens are stable.
  // ------------------------------------------------------------------
  private[operators] def decodePixels(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val n = math.max(meta.width * meta.height, 1)
    val out = new Array[Byte](n)
    var h = 0x811c9dc5 // FNV-ish roll of the payload drives the fake pixels
    var i = 0
    while (i < n) {
      val b = if (payload.length > 0) payload(i % payload.length) else 0
      h = (h ^ b) * 0x01000193
      out(i) = (h >>> 24).toByte
      i += 1
    }
    out
  }

  /** Normalized 16-bin byte histogram — the feature contract a real
    * embedding model would replace.
    */
  private[operators] def byteHistogram(pixels: Array[Byte], bins: Int = 16): Array[Float] = {
    val hist = new Array[Float](bins)
    var i = 0
    while (i < pixels.length) {
      hist((pixels(i) & 0xff) * bins / 256) += 1f
      i += 1
    }
    if (pixels.length > 0) {
      var j = 0
      while (j < bins) { hist(j) /= pixels.length; j += 1 }
    }
    hist
  }

  /** Batched image decode + feature extraction: processes each partition
    * in fixed-size chunks (the mapInPandas batch shape) so a real codec
    * can amortize setup per chunk, not per row.
    */
  def decodeImages(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        // per-chunk setup would live here (codec init, buffer reuse)
        chunk.iterator.map { r =>
          val px = decodePixels(r.payload, r.meta)
          ImageFeatures(r.doc_id, r.meta.width, r.meta.height, 1, byteHistogram(px))
        }
      }
    }
  }

  /** Deterministic resize stub: re-derive the fake pixel buffer at the
    * target geometry (a real impl would interpolate).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val px = decodePixels(r.payload, r.meta.copy(width = w, height = h))
        ImageFeatures(r.doc_id, w, h, 1, byteHistogram(px))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk of the payload is one "frame" (a real impl would demux).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
                   stride: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(col("modality") === "video").as[MediaRow].flatMap { r =>
      val nFrames = math.max(r.payload.length / frameBytes, 1)
      (0 until nFrames by stride).map { fi =>
        val from = fi * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        FrameSample(r.doc_id, fi, r.payload.slice(from, math.max(until, from)))
      }
    }
  }
}
