package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (BASELINE.json north star): image/audio/video
  * as opaque `BinaryType` payloads with typed metadata, plus batch-shaped
  * decode / feature-extraction plumbing.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[FakeDecoder]] derives deterministic pseudo-features from
  * the bytes. Everything around it — schema, partitioning, the
  * iterator-per-partition batch shape (`mapPartitions`, the Scala
  * equivalent of Python's `mapInPandas`), frame explosion — is real and
  * tested, so swapping in a JNI/ffmpeg decoder is a one-function change.
  */
object Multimodal {

  /** Attach an opaque binary payload + metadata struct. In production the
    * payload would come from an object store via a binary source
    * (`spark.read.format("binaryFile")`); here it is derived from text so
    * the plumbing is exercisable on the testdata. */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col(textCol), "UTF-8")).as("checksum"),
        lit("application/octet-stream").as("mime")).as("media_meta"))

  /** Deterministic fake decoder: pseudo width/height/intensity from the
    * payload bytes. Replace with a real decoder (JNI, ffmpeg, JCodec…) for
    * production; signature and batch shape stay identical. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val width = 64 + (n % 576)           // 64..639
      val height = 64 + ((n * 7) % 416)    // 64..479
      // "mean intensity": average byte value — a real decoder would return
      // pixel stats; this is deterministic and cheap
      val mean = if (n == 0) 0.0 else payload.map(_ & 0xFF).map(_.toLong).sum.toDouble / n
      (width, height, mean)
    }
  }

  /** Per-partition batched feature extraction — the `mapInPandas` shape:
    * one decoder context per partition, an iterator of rows through it.
    * Partition count controls decoder parallelism at scale. */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      // copy the id field's actual type (like resize) — hard-coding Long
      // would ClassCastException on int/string ids at task time
      df.schema(idCol),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_intensity", DoubleType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { rows =>
      // decoder/session init would happen ONCE per partition here
      rows.map { r =>
        // null payloads (e.g. from a null source text) decode as empty
        val payload = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        val (w, h, m) = FakeDecoder.decode(payload)
        Row(r.get(idIdx), w, h, m)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Batched resize — same per-partition batch shape as
    * [[extractFeatures]]. The pixel resample is STUBBED (deterministic
    * byte re-sampling to `targetBytes`); a real implementation swaps the
    * body of `resampleBytes` for an image scaler and keeps the schema:
    * payload is REPLACED and `media_meta` is rewritten to match, so
    * downstream consumers cannot read stale metadata. */
  def resize(df: DataFrame, idCol: String, targetBytes: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_meta", StructType(Seq(
        StructField("n_bytes", LongType, nullable = false),
        StructField("checksum", StringType, nullable = false),
        StructField("mime", StringType, nullable = false))), nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    def resampleBytes(in: Array[Byte], n: Int): Array[Byte] = {
      if (in.isEmpty) return new Array[Byte](0)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = in((i.toLong * in.length / n).toInt); i += 1 }
      out
    }
    val rdd = df.rdd.mapPartitions { rows =>
      val md5 = java.security.MessageDigest.getInstance("MD5") // once per partition
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        val resized = resampleBytes(payload, targetBytes)
        md5.reset()
        val checksum = md5.digest(resized).map("%02x".format(_)).mkString
        Row(r.get(idIdx), resized,
          Row(resized.length.toLong, checksum, "application/octet-stream"))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling stub: explode `nFrames` pseudo-frames per media row
    * (a video decoder would emit real frame payloads; the shape —
    * one row per (media, frame_idx) — is what downstream training
    * pipelines consume). */
  def frameSample(df: DataFrame, idCol: String, everyNBytes: Int = 256): DataFrame =
    df.select(col(idCol), col("media_meta.n_bytes").as("n_bytes"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest((col("n_bytes") / everyNBytes).cast("int") - 1, lit(0)))))
      .withColumn("frame_offset", col("frame_idx") * everyNBytes)
      .select(col(idCol), col("frame_idx"), col("frame_offset"))
}
