package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed iterator-to-iterator per partition.
  *
  * The decode step is STUBBED (no image/audio codecs ship in this
  * container): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — schema, batch shape, partition-wise
  * execution, metadata threading — is the real distributed plumbing: swap
  * `decodeStub` for a codec (JNI/FFI or an external model server) and the
  * plan is unchanged. mapPartitions keeps per-partition setup (codec init,
  * model load) amortized across rows, the same shape a Pandas-UDF/Arrow
  * batch path gives PySpark.
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

  /** STUB decode: a real implementation would decode pixels/samples here.
    * ??? is replaced by a deterministic byte-derived feature so the
    * distributed path is testable end-to-end offline.
    */
  private[ops] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here (libjpeg / ffmpeg / model server call)
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
        AssetFeatures(a.asset_id, a.modality,
          if (a.bytes == null) 0 else a.bytes.length,
          checksum(a.bytes), decodeStub(a.bytes, dim))
      }
    }
  }

  case class ResizedAsset(asset_id: Long, width: Int, height: Int,
                          bytes: Array[Byte])

  /** Image resize into a bounding box, aspect-preserving (never upscales):
    * the standard pre-training normalization pass. Iterator-to-iterator per
    * partition like [[extractFeatures]] — resampler init amortizes across
    * the partition. The pixel resample itself is STUBBED (deterministic
    * byte truncation to the new pixel count) so the dims math, metadata
    * threading and batch shape are testable offline; swap the stub for a
    * real resampler and the plan is unchanged.
    */
  def resizeImages(assets: Dataset[Asset], maxW: Int,
                   maxH: Int): Dataset[ResizedAsset] = {
    require(maxW > 0 && maxH > 0)
    implicit val enc = Encoders.product[ResizedAsset]
    assets.filter(_.modality == "image").mapPartitions { it =>
      // per-partition setup (resampler init) would run here, once
      it.map { a =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / a.width, maxH.toDouble / a.height))
        val nw = math.max(1, math.floor(a.width * scale).toInt)
        val nh = math.max(1, math.floor(a.height * scale).toInt)
        // ??? <- real resample goes here; stub keeps the first nw*nh bytes
        val out =
          if (a.bytes == null) Array.empty[Byte]
          else a.bytes.take(nw * nh)
        ResizedAsset(a.asset_id, nw, nh, out)
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

  /** Deterministic synthetic asset table for tests/demos (no real media in
    * the container).
    */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = Array.tabulate[Byte](64 + (id % 64).toInt)(j =>
        ((id * 31 + j * 7) % 256 - 128).toByte)
      Asset(id, modality, bytes,
        modality match {
          case "image" => "image/jpeg"; case "audio" => "audio/wav"
          case _ => "video/mp4"
        },
        if (modality == "image") 64 else 0,
        if (modality == "image") 48 else 0,
        if (modality == "video") 5000 + (id % 5) * 1000 else 0)
    }
  }
}
