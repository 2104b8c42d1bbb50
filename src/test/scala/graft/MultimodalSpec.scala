package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: MediaRow*) = rows.toDS()

  private val img = MediaRow(1L, "image",
    "some image payload bytes".getBytes("UTF-8"),
    MediaMeta("png", 8, 4, 0, 0))
  private val vid = MediaRow(2L, "video",
    Array.tabulate(200)(_.toByte),
    MediaMeta("mp4", 0, 0, 0, 6))

  test("decodeImages: batched partition transform yields stable features") {
    val out1 = Multimodal.decodeImages(media(img), batchSize = 2).collect()
    val out2 = Multimodal.decodeImages(media(img), batchSize = 64).collect()
    assert(out1.length == 1 && out2.length == 1)
    // batch size must not change results (pure per-row contract)
    assert(out1.head.histogram.toSeq == out2.head.histogram.toSeq)
    assert(out1.head.width == 8 && out1.head.height == 4)
    // histogram is a 16-bin probability vector
    val h = out1.head.histogram
    assert(h.length == 16)
    assert(math.abs(h.sum - 1.0) < 1e-5)
  }

  test("resize re-derives geometry; histogram stays normalized") {
    val out = Multimodal.resize(media(img), 16, 16).collect().head
    assert(out.width == 16 && out.height == 16)
    assert(math.abs(out.histogram.sum - 1.0) < 1e-5)
  }

  test("sampleFrames: every stride-th fixed-size chunk, video only") {
    val out = Multimodal.sampleFrames(media(img, vid), frameBytes = 32, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.forall(_.doc_id == 2L)) // image filtered out
    // 200 bytes / 32 = 6 frames, stride 2 → indices 0,2,4
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(out.head.frame.length == 32)
    assert(out.head.frame.toSeq == (0 until 32).map(_.toByte).toSeq)
  }

  test("mediaFrom emits binary payload + typed metadata per modality") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("doc_id", "text")
    val m = Multimodal.mediaFrom(docs)
      .select("doc_id", "modality", "meta.format")
      .as[(Long, String, String)].collect()
      .map { case (k, m2, f) => k -> ((m2, f)) }.toMap
    assert(m == Map(
      0L -> (("image", "png")), 1L -> (("audio", "wav")), 2L -> (("video", "mp4"))))
    val payload = Multimodal.mediaFrom(docs).filter(col("doc_id") === 0)
      .select("payload").as[Array[Byte]].head()
    assert(new String(payload, "UTF-8") == "alpha")
  }
}
