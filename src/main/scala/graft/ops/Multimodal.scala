package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed iterator-to-iterator per partition.
  *
  * IMAGE decode/resample is REAL: `javax.imageio` (JPEG/PNG/BMP/GIF ship
  * in the JDK) + `Graphics2D` bilinear resample — no external codec
  * needed. Payloads that no ImageIO reader recognizes (and the
  * audio/video modalities, whose codecs genuinely don't ship in this
  * container) fall back to `decodeStub`, a deterministic byte-derived
  * stand-in, so the distributed path stays testable end-to-end on opaque
  * payloads. Everything around the codec seam — schema, batch shape,
  * partition-wise execution, metadata threading — is the real distributed
  * plumbing: swap the stub for ffmpeg/JNI and the plan is unchanged.
  * mapPartitions keeps per-partition setup (codec init, model load)
  * amortized across rows, the same shape a Pandas-UDF/Arrow batch path
  * gives PySpark.
  */
object Multimodal {

  /** Typed asset row: modality ∈ {image, audio, video}. */
  case class Asset(asset_id: Long, modality: String, bytes: Array[Byte],
                   mime: String, width: Int, height: Int, duration_ms: Long)

  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Int,
                           checksum: Long, feature: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** STUB decode for audio/video (no codecs in this container) and for
    * payloads that fail real image decode: a deterministic byte-derived
    * feature so the distributed path is testable end-to-end offline.
    */
  private[ops] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here (ffmpeg / model server call); the IMAGE
    // branch is real — see tryDecodeImage/imageFeatures
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / math.max(1, bytes.length / dim); d += 1 }
    out
  }

  /** Real image decode via the JDK's ImageIO. None when no registered
    * reader recognizes the payload (caller falls back to [[decodeStub]]) —
    * which is also how the opaque stand-in payloads of
    * [[assetsFromDocuments]] keep their deterministic stub features.
    */
  private[ops] def tryDecodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Features from REAL pixels: per-bucket mean luminance (Rec.601) over
    * `dim` row-major pixel buckets — deterministic, codec-backed.
    */
  private[ops] def imageFeatures(img: java.awt.image.BufferedImage,
                                 dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val counts = new Array[Int](dim)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (0.299f * ((rgb >> 16) & 0xff) +
          0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255.0f
        val b = (y * w + x) % dim
        out(b) += lum; counts(b) += 1
        x += 1
      }
      y += 1
    }
    var d = 0
    while (d < dim) { if (counts(d) > 0) out(d) /= counts(d); d += 1 }
    out
  }

  /** Deterministic PNG payload with caller-supplied pixels — the real-image
    * generator behind [[syntheticAssets]] and the golden decode tests.
    */
  def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def checksum(bytes: Array[Byte]): Long = {
    val crc = new java.util.zip.CRC32()
    if (bytes != null) crc.update(bytes)
    crc.getValue
  }

  /** Feature extraction: one iterator-to-iterator pass per partition.
    * Codec/model initialization happens once per partition (the `dim`
    * capture stands in for it), NOT once per row.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.mapPartitions { it =>
      // per-partition setup (codec init) would run here, once
      it.map { a =>
        val feature =
          if (a.modality == "image")
            tryDecodeImage(a.bytes).map(imageFeatures(_, dim))
              .getOrElse(decodeStub(a.bytes, dim))
          else decodeStub(a.bytes, dim)
        AssetFeatures(a.asset_id, a.modality,
          if (a.bytes == null) 0 else a.bytes.length,
          checksum(a.bytes), feature)
      }
    }
  }

  case class ResizedAsset(asset_id: Long, width: Int, height: Int,
                          bytes: Array[Byte])

  /** Image resize into a bounding box, aspect-preserving (never upscales):
    * the standard pre-training normalization pass. Iterator-to-iterator per
    * partition like [[extractFeatures]] — resampler init amortizes across
    * the partition.
    *
    * Decodable payloads take the REAL path: ImageIO decode (dims come from
    * the decoded image, not the metadata), `Graphics2D` bilinear resample,
    * PNG re-encode. Undecodable payloads keep the declared stub (dims from
    * metadata, byte truncation to the new pixel count) so opaque stand-in
    * payloads remain exactly reproducible.
    */
  def resizeImages(assets: Dataset[Asset], maxW: Int,
                   maxH: Int): Dataset[ResizedAsset] = {
    require(maxW > 0 && maxH > 0)
    implicit val enc = Encoders.product[ResizedAsset]
    assets.filter(_.modality == "image").mapPartitions { it =>
      // per-partition setup (resampler init) would run here, once
      def box(w: Int, h: Int): (Int, Int) = {
        val scale = math.min(1.0,
          math.min(maxW.toDouble / w, maxH.toDouble / h))
        (math.max(1, math.floor(w * scale).toInt),
          math.max(1, math.floor(h * scale).toInt))
      }
      it.map { a =>
        tryDecodeImage(a.bytes) match {
          case Some(img) =>
            val (nw, nh) = box(img.getWidth, img.getHeight)
            if (nw == img.getWidth && nh == img.getHeight)
              ResizedAsset(a.asset_id, nw, nh, a.bytes)
            else {
              val scaled = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", baos)
              ResizedAsset(a.asset_id, nw, nh, baos.toByteArray)
            }
          case None =>
            val (nw, nh) = box(a.width, a.height)
            // ??? <- non-JDK codecs go here; stub keeps the first nw*nh bytes
            val out =
              if (a.bytes == null) Array.empty[Byte]
              else a.bytes.take(nw * nh)
            ResizedAsset(a.asset_id, nw, nh, out)
        }
      }
    }
  }

  /** Frame sampling for video assets: emit one row per sampled frame index
    * (every `everyMs` of duration) — the fan-out is a generator
    * (flatMap), not a driver loop; frame decode itself is stubbed.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.modality == "video")
      .flatMap { a =>
        val n = math.max(1, (a.duration_ms / everyMs).toInt)
        (0 until n).map(i => (a.asset_id, i, i * everyMs,
          decodeStub(a.bytes, 8)))
      }
      .toDF("asset_id", "frame_idx", "frame_ts_ms", "frame_feature")
  }

  /** Bind the opaque-binary Asset schema to a real corpus table: bytes =
    * UTF-8 of the text column (standing in for media payloads, which the
    * container lacks), modality round-robin by id, video duration derived
    * from the id. Fully deterministic, so downstream checksums/features are
    * stable and the frame fan-out is oracle-checkable.
    */
  def assetsFromDocuments(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes =
          if (text == null) Array.empty[Byte]
          else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Asset(id, modality, bytes,
          modality match {
            case "image" => "image/jpeg"; case "audio" => "audio/wav"
            case _ => "video/mp4"
          },
          if (modality == "image") 64 else 0,
          if (modality == "image") 48 else 0,
          if (modality == "video") (1 + id % 5) * 1000 else 0L)
      }
  }

  /** Deterministic synthetic asset table for tests/demos. Image assets are
    * REAL PNGs (deterministic per-id pixel pattern) exercising the ImageIO
    * decode path; audio/video payloads stay opaque byte patterns for the
    * declared stub path.
    */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes =
        if (modality == "image")
          pngBytes(64, 48, (x, y) =>
            (((x * 4 + id) % 256).toInt << 16) |
              (((y * 5 + id * 3) % 256).toInt << 8) |
              ((x + y + id * 7) % 256).toInt)
        else Array.tabulate[Byte](64 + (id % 64).toInt)(j =>
          ((id * 31 + j * 7) % 256 - 128).toByte)
      Asset(id, modality, bytes,
        modality match {
          case "image" => "image/png"; case "audio" => "audio/wav"
          case _ => "video/mp4"
        },
        if (modality == "image") 64 else 0,
        if (modality == "image") 48 else 0,
        if (modality == "video") 5000 + (id % 5) * 1000 else 0)
    }
  }
}
