package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload + metadata coherence through
  * attach → resize → extract, and frame-sampling shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.attachBinary(
    Seq((1L, "hello world, a medium-sized payload for resizing"),
        (2L, "x"), (3L, "")).toDF("doc_id", "text"), "doc_id", "text").cache()

  test("attachBinary: metadata matches the payload") {
    val r = media.filter(col("doc_id") === 1)
      .select(octet_length(col("payload")), col("media_meta.n_bytes")).head()
    assert(r.getInt(0).toLong == r.getLong(1))
  }

  test("resize: payload resampled to target, metadata rewritten to match") {
    val out = Multimodal.resize(media, "doc_id", targetBytes = 16)
    val rows = out.select(col("doc_id"), octet_length(col("payload")),
        col("media_meta.n_bytes"), col("media_meta.checksum"),
        md5(col("payload"))).collect()
    for (r <- rows) {
      if (r.getLong(0) == 3L) assert(r.getInt(1) == 0) // empty stays empty
      else assert(r.getInt(1) == 16)
      assert(r.getInt(1).toLong == r.getLong(2), "n_bytes must match resized payload")
      assert(r.getString(3) == r.getString(4), "checksum must match resized payload")
    }
    // deterministic: same input → same resized bytes
    val a = Multimodal.resize(media, "doc_id", 16)
      .select("media_meta.checksum").collect().map(_.getString(0)).sorted.toSeq
    val b = Multimodal.resize(media, "doc_id", 16)
      .select("media_meta.checksum").collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
  }

  test("extractFeatures: one feature row per media row, deterministic") {
    val f = Multimodal.extractFeatures(media, "doc_id")
    assert(f.count() == 3)
    assert(f.schema.fieldNames.toSeq == Seq("doc_id", "width", "height", "mean_intensity"))
  }

  test("frameSample: one row per (media, frame), offsets on the grid") {
    val frames = Multimodal.frameSample(media, "doc_id", everyNBytes = 16)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) == 3L) // 49 bytes / 16 → 3 frames
    assert(byDoc(2L) == 1L && byDoc(3L) == 1L) // floor at 1 frame
    val offs = frames.filter(col("doc_id") === 1).orderBy("frame_idx")
      .select("frame_offset").collect().map(_.getInt(0)).toSeq
    assert(offs == Seq(0, 16, 32))
  }
}
