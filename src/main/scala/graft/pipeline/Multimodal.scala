package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * Two decoder tiers share the same partition-preserving `mapPartitions`
  * batch contract (one decoder per partition, constant memory, payloads
  * never shuffle — the shape that matters at 100 TB):
  *
  *  - [[decodeImage]] / [[decodeImageFeatures]]: REAL image decode via
  *    `javax.imageio` (ships in the JDK — PNG/JPEG/GIF/BMP need no
  *    external codec), with per-row error isolation: a corrupt payload
  *    yields a null-dims row, never a failed partition.
  *  - [[fakeDecode]] / [[decodeFeatures]]: a deterministic byte-rule
  *    decoder standing in for formats the JDK can't read (video,
  *    audio) — kept because its outputs are arithmetically predictable
  *    from the payload, which is what lets an external oracle verify
  *    the *plumbing* (schema, batching, projection) independent of any
  *    codec.
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

  /** Deterministic byte-rule decoder for payload formats the JDK has no
    * codec for (video/audio — real *image* decode is [[decodeImage]]).
    * Derives "decoded" properties purely from the payload bytes so an
    * external oracle can predict them: width/height from the first/last
    * byte, "pixels" = the payload itself. A codec-backed implementation
    * replaces only this function; the batch plumbing stays. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (payload == null || payload.isEmpty) (0, 0, Array.emptyByteArray)
    else {
      val w = (payload(0) & 0x7F) + 1
      val h = (payload(payload.length - 1) & 0x7F) + 1
      (w, h, payload)
    }
  }

  // ------------------------------------------------------------ real decode

  /** Deterministic single-shade PNG — the fixture generator for the real
    * decoder. Pure JDK (`BufferedImage` + `ImageIO.write`), safe on
    * executors and in headless JVMs; PNG is lossless, so the decoded
    * pixel values reproduce `shade` exactly and an oracle can predict
    * every output of [[decodeImageFeatures]] arithmetically. */
  def pngPayload(width: Int, height: Int, shade: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad size ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (shade & 0xFF) * 0x010101
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode via `javax.imageio` (in the JDK; PNG/JPEG/GIF/BMP).
    * Returns (width, height, mean gray level over the red channel), or
    * None for null/empty/undecodable payloads — ImageIO signals corrupt
    * input by returning null or throwing, both mapped to None so one bad
    * row can never fail its partition. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xFF; x += 1 }
          y += 1
        }
        Some((w, h, sum / (w.toLong * h)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode + feature-extract with the real decoder, same per-partition
    * batch contract as [[decodeFeatures]]. Output per media row:
    * byte_len always; width/height/mean_px from the actual decode, null
    * with ok=false when the payload is corrupt (per-row isolation). */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("byte_len", LongType),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("mean_px", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      // ImageIO reader instances initialize lazily per partition here
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val len = if (payload == null) 0L else payload.length.toLong
        decodeImage(payload) match {
          case Some((w, h, mean)) => Row(id, len, w.toLong, h.toLong, mean, true)
          case None => Row(id, len, null, null, null, false)
        }
      }
    }(encoder)
  }

  /** Deterministic image corpus over a `doc_id` column: a real PNG whose
    * dims/shade derive arithmetically from the id — except every 97th
    * id, which gets a deliberately corrupt payload (PNG magic + garbage)
    * to exercise the decoder's per-row error isolation. The id→property
    * rules are the oracle's contract: width = id%13+1, height = id%7+1,
    * shade = id%251, corrupt ⇔ id%97=0. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("format", StringType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 97 == 0)
          // valid PNG signature, garbage body: ImageIO must reject it
          Row(id, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 1, 2, 3),
            "image/png")
        else
          Row(id, pngPayload((id % 13 + 1).toInt, (id % 7 + 1).toInt, (id % 251).toInt),
            "image/png")
      }
    }(encoder)
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
