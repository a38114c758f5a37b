package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The container has no media codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[fakeDecode]]); everything around
  * it — the schema contract, the partition-preserving `mapPartitions`
  * batch shape, the feature projection — is the real Spark plumbing a
  * codec-backed implementation would drop into unchanged (swap
  * [[fakeDecode]] for the JNI/FFmpeg call; at 100 TB this runs one
  * decoder instance per partition, no shuffle).
  */
object Multimodal {

  /** Canonical media row contract: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (codec libraries are not available in this environment).
    * Derives "decoded" properties purely from the payload bytes so tests
    * are reproducible: width/height from the first bytes, "pixels" = the
    * payload itself. A real implementation replaces only this function.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (payload == null || payload.isEmpty) (0, 0, Array.emptyByteArray)
    else {
      val w = (payload(0) & 0x7F) + 1
      val h = (payload(payload.length - 1) & 0x7F) + 1
      (w, h, payload)
    }
  }

  /** Attach fake media payloads to the documents table (md5 of the text as
    * a deterministic 16-byte "blob") — gives every SF corpus a binary
    * column to exercise the plumbing against. Pure Catalyst expressions. */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      unhex(md5(col("text"))).as("payload"),
      lit("fake/blob").as("format"))

  /** Decode + feature-extract over partitions. The batch shape is the
    * production contract: one iterator pass per partition, constant
    * memory, decoder state reusable across rows within a partition. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("head_hex", StringType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      // decoder init would happen here, once per partition
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (w, h, pixels) = fakeDecode(payload)
        val headHex = pixels.take(4).map(b => f"${b & 0xff}%02x").mkString
        Row(id, if (payload == null) 0L else payload.length.toLong, w, h, headHex)
      }
    }(encoder)
  }

  /** Resize: nearest-neighbor downsample/upsample of the decoded pixel
    * buffer to `outW`×`outH`. Same per-partition batch contract as
    * [[decodeFeatures]] — decode state initialized once per partition,
    * one pass, no shuffle; a codec-backed implementation swaps
    * [[fakeDecode]] and the sampling loop for the library call. The
    * fake decode treats the payload as a w×h byte raster (row-major),
    * so the resampling arithmetic — source index = (y·h/outH)·w +
    * x·w/outW — is the real thing. */
  def resize(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (w, h, pixels) = fakeDecode(payload)
        if (w == 0 || h == 0 || pixels.length < w.toLong * h) Row(id, 0, 0, Array.emptyByteArray)
        else {
          val out = new Array[Byte](outW * outH)
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * h / outH).toInt
            var x = 0
            while (x < outW) {
              out(y * outW + x) = pixels(sy * w + (x.toLong * w / outW).toInt)
              x += 1
            }
            y += 1
          }
          Row(id, outW, outH, out)
        }
      }
    }(encoder)
  }

  /** Frame sampling stub for video-like payloads: every `stride`-th byte
    * window as a "frame". Pure binary slicing — `substring` works on
    * binary natively so this stays codegen-friendly. */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame =
    media
      // empty payloads yield no frames (sequence(0, greatest(-1,0))
      // would otherwise emit one phantom empty frame); null payloads
      // already explode to nothing
      .where(coalesce(length(col("payload")), lit(0)) > 0)
      .select(
      col("media_id"),
      posexplode(
        transform(
          sequence(lit(0L),
            greatest((ceil(length(col("payload")) / lit(stride)) - lit(1)).cast("long"), lit(0L))),
          i => col("payload").substr((i * stride + 1).cast("int"), lit(frameLen)))))
      .toDF("media_id", "frame_no", "frame")
}
