package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed iterator-to-iterator per partition.
  *
  * IMAGE decode/resample is REAL: `javax.imageio` (JPEG/PNG/BMP/GIF ship
  * in the JDK) + `Graphics2D` bilinear resample — no external codec
  * needed. AUDIO decode/resample is REAL for RIFF/WAVE PCM payloads
  * (8/16/24/32-bit int and 32-bit float, any channel count): the
  * container format is a trivial chunked header over raw samples, parsed
  * here directly ([[tryDecodeWav]]) with no codec library at all.
  * Payloads that neither path recognizes (and the video modality, whose
  * codecs genuinely don't ship in this container) fall back to
  * `decodeStub`, a deterministic byte-derived stand-in, so the
  * distributed path stays testable end-to-end on opaque payloads.
  * Everything around the codec seam — schema, batch shape,
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
  private[graft] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
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

  // ImageIO defaults to a FILE-backed stream cache: every
  // ImageIO.read(InputStream) creates (and deletes) a temp file before
  // decoding — at corpus scale that is one filesystem round-trip per
  // image and a global temp-dir contention point across executor
  // threads. Payloads here are already in-memory byte arrays, so the
  // disk cache buys nothing; keep decoding purely in memory. (JVM-global
  // flag, set once per executor at classload.)
  javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode via the JDK's ImageIO (in-memory streams — see the
    * setUseCache note above). None when no registered reader recognizes
    * the payload (caller falls back to [[decodeStub]]) — which is also
    * how the opaque stand-in payloads of [[assetsFromDocuments]] keep
    * their deterministic stub features.
    */
  private[graft] def tryDecodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
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

  // --- audio: RIFF/WAVE PCM, decoded by hand (no codec library) ---------

  /** Decoded audio: sample rate + channel count of the source, samples
    * mixed down to mono and normalized to [-1, 1).
    */
  case class WavData(sampleRate: Int, channels: Int, samples: Array[Float])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Real WAV decode: walks the RIFF chunk list for `fmt ` + `data`,
    * supports PCM (format 1) at 8 (unsigned) / 16 / 24 / 32-bit (signed
    * little-endian) and IEEE float (format 3) at 32-bit, any channel
    * count (mixed to mono by averaging). None on anything that isn't a
    * well-formed PCM WAV — the caller falls back to the declared stub, so
    * opaque stand-in payloads keep their deterministic stub features.
    */
  private[graft] def tryDecodeWav(bytes: Array[Byte]): Option[WavData] = {
    if (bytes == null || bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
      bytes(10) != 'V' || bytes(11) != 'E') return None
    var fmt = -1; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(bytes, o + 4).toInt
      if (size < 0 || o + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        fmt = u16(bytes, o + 8)
        channels = u16(bytes, o + 10)
        rate = u32(bytes, o + 12).toInt
        bits = u16(bytes, o + 22)
      } else if (id == "data") { dataOff = o + 8; dataLen = size }
      o += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (dataOff < 0 || channels <= 0 || rate <= 0) return None
    val bytesPer = bits / 8
    val frameBytes = bytesPer * channels
    val ok = (fmt == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
      (fmt == 3 && bits == 32)
    if (!ok || frameBytes == 0) return None
    val nFrames = dataLen / frameBytes
    val out = new Array[Float](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val p = dataOff + f * frameBytes + c * bytesPer
        val v: Float =
          if (fmt == 3)
            java.lang.Float.intBitsToFloat(u32(bytes, p).toInt)
          else bits match {
            case 8  => ((bytes(p) & 0xff) - 128) / 128.0f
            case 16 => u16(bytes, p).toShort / 32768.0f
            case 24 =>
              val raw = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
                (bytes(p + 2) << 16) // sign-extends via the Byte
              raw / 8388608.0f
            case _ => u32(bytes, p).toInt / 2147483648.0f
          }
        acc += v
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    Some(WavData(rate, channels, out))
  }

  /** 16-bit PCM mono WAV writer — the re-encode half of the real audio
    * path. Quantization is floor(x*32767 + 0.5) clamped to short range
    * (stated exactly because the contract oracle reproduces it in SQL).
    */
  def wavBytes(sampleRate: Int, samples: Array[Float]): Array[Byte] = {
    val n = samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + 2 * n); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1) // PCM, mono
    buf.putInt(sampleRate); buf.putInt(sampleRate * 2)
    buf.putShort(2); buf.putShort(16) // block align, bits
    buf.put("data".getBytes); buf.putInt(2 * n)
    var i = 0
    while (i < n) {
      val q = math.floor(samples(i) * 32767.0 + 0.5)
      buf.putShort(math.max(-32768, math.min(32767, q)).toShort)
      i += 1
    }
    buf.array()
  }

  /** Per-bucket RMS over `dim` contiguous time buckets (bucket of sample i
    * = i*dim/n, integer division) — the audio analogue of
    * [[imageFeatures]]' luminance buckets. Deterministic, codec-backed.
    */
  private[graft] def audioFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val counts = new Array[Int](dim)
    val n = samples.length
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      out(b) += samples(i) * samples(i); counts(b) += 1
      i += 1
    }
    var d = 0
    while (d < dim) {
      if (counts(d) > 0) out(d) = math.sqrt(out(d) / counts(d)).toFloat
      d += 1
    }
    out
  }

  /** Whole-signal RMS accumulated in double precision. Decoded 16-bit PCM
    * samples are exact rationals k/32768 (representable exactly in float),
    * so every v*v term and their sum are exact in double — the only
    * inexact steps (mean division, sqrt) are IEEE-deterministic, which is
    * what lets the contract oracle reproduce this value bit-for-bit in SQL.
    */
  private[graft] def rms(samples: Array[Float]): Double = {
    if (samples.isEmpty) return 0.0
    var s = 0.0; var i = 0
    while (i < samples.length) {
      val v = samples(i).toDouble; s += v * v; i += 1
    }
    math.sqrt(s / samples.length)
  }

  /** Sign changes between consecutive samples (negative vs non-negative). */
  private[graft] def zeroCrossings(samples: Array[Float]): Int = {
    var zc = 0; var i = 1
    while (i < samples.length) {
      if ((samples(i - 1) < 0) != (samples(i) < 0)) zc += 1
      i += 1
    }
    zc
  }

  /** Linear-interpolation resample. Output length floor(n*dst/src); output
    * sample j reads fractional source position j*src/dst — when dst
    * divides src this degenerates to exact decimation (no interpolation
    * error), which is what the contract query certifies.
    */
  private[graft] def resampleLinear(samples: Array[Float], srcRate: Int,
                                  dstRate: Int): Array[Float] = {
    require(srcRate > 0 && dstRate > 0)
    val n = samples.length
    val m = (n.toLong * dstRate / srcRate).toInt
    val out = new Array[Float](m)
    var j = 0
    while (j < m) {
      val pos = j.toDouble * srcRate / dstRate
      val i0 = pos.toInt
      val frac = pos - i0
      val a = samples(math.min(i0, n - 1))
      val b = samples(math.min(i0 + 1, n - 1))
      out(j) = (a * (1 - frac) + b * frac).toFloat
      j += 1
    }
    out
  }

  case class ResampledAudio(asset_id: Long, sample_rate: Int, n_samples: Int,
                            bytes: Array[Byte])

  /** Audio resample to a target rate: REAL for decodable WAV payloads
    * (hand-rolled PCM decode → linear interp → 16-bit mono re-encode),
    * declared stub passthrough otherwise. Iterator-to-iterator per
    * partition like [[resizeImages]].
    */
  def resampleAudio(assets: Dataset[Asset], targetRate: Int): Dataset[ResampledAudio] = {
    require(targetRate > 0)
    implicit val enc = Encoders.product[ResampledAudio]
    assets.filter(_.modality == "audio").mapPartitions { it =>
      it.map { a =>
        tryDecodeWav(a.bytes) match {
          case Some(w) =>
            val res = resampleLinear(w.samples, w.sampleRate, targetRate)
            ResampledAudio(a.asset_id, targetRate, res.length,
              wavBytes(targetRate, res))
          case None =>
            // ??? <- non-WAV audio codecs go here; stub passes bytes through
            ResampledAudio(a.asset_id, targetRate,
              if (a.bytes == null) 0 else a.bytes.length, a.bytes)
        }
      }
    }
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

  /** Deterministic 24-bit BMP payload — the uncompressed sibling of
    * [[pngBytes]]: a hand-written 54-byte header + bottom-up BGR rows
    * (padded to 4-byte multiples), no encoder library at all, so
    * GENERATING a test image is pure byte math while DECODING it still
    * exercises the real ImageIO path (the JDK ships a BMP reader).
    * [[imagesFromDocuments]] uses this: PNG deflate encode was ~2/3 of
    * the contract query's cost and proves nothing the BMP doesn't.
    */
  def bmpBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) & ~3
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54) // file size, rsvd, offset
    buf.putInt(40).putInt(w).putInt(h)             // info header, +h = bottom-up
    buf.putShort(1).putShort(24)                   // planes, bpp
    buf.putInt(0).putInt(dataSize)                 // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = rgb(x, y) & 0xffffff
        buf.put((v & 0xff).toByte)         // B
        buf.put(((v >> 8) & 0xff).toByte)  // G
        buf.put(((v >> 16) & 0xff).toByte) // R
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
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
          else if (a.modality == "audio")
            tryDecodeWav(a.bytes).map(w => audioFeatures(w.samples, dim))
              .getOrElse(decodeStub(a.bytes, dim))
          else decodeStub(a.bytes, dim)
        AssetFeatures(a.asset_id, a.modality,
          if (a.bytes == null) 0 else a.bytes.length,
          checksum(a.bytes), feature)
      }
    }
  }

  /** 64-bit difference hash (dHash, Krawetz) of a decoded image: exact
    * area-average the pixels onto a 9×8 luminance grid (pixel (x, y) →
    * cell (x·9/w, y·8/h), integer mapping — deterministic, no resampler),
    * then bit i·8+j = 1 iff cell(j, i) < cell(j+1, i) — the sign of the
    * horizontal luminance gradient. The classic near-dup image
    * fingerprint: stable under re-encoding, resizing and small edits, so
    * hamming-close hashes mean near-identical images. Cells that receive
    * no pixel (w < 9 or h < 8) average to 0 — still deterministic.
    */
  private[graft] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val sums = new Array[Double](gw * gh)
    val counts = new Array[Int](gw * gh)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer Rec.601 luminance weights: exact in double, no float
        // accumulation-order sensitivity
        val lum = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)
        val c = (y.toLong * gh / h).toInt * gw + (x.toLong * gw / w).toInt
        sums(c) += lum; counts(c) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    while (i < gh) {
      var j = 0
      while (j < gw - 1) {
        val a = if (counts(i * gw + j) > 0) sums(i * gw + j) / counts(i * gw + j) else 0.0
        val b = if (counts(i * gw + j + 1) > 0) sums(i * gw + j + 1) / counts(i * gw + j + 1) else 0.0
        if (a < b) bits |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    bits
  }

  /** Perceptual hashes of the image assets: (asset_id, dhash) with a REAL
    * codec behind it (ImageIO decode → [[dHash64]]); payloads no reader
    * recognizes yield a null hash (they carry no pixel signal — hashing
    * their bytes would manufacture spurious near-pairs), which
    * [[imageNearDups]] filters out. One iterator-to-iterator pass, codec
    * init amortized per partition like [[extractFeatures]].
    */
  def imageHashes(assets: Dataset[Asset]): DataFrame = {
    implicit val enc = Encoders.product[(Long, Option[Long])]
    assets.filter(_.modality == "image").mapPartitions { it =>
      it.map(a => (a.asset_id, tryDecodeImage(a.bytes).map(dHash64)))
    }.toDF("asset_id", "dhash")
  }

  /** Near-duplicate IMAGE pairs — the LAION-style image dedup pass: dHash
    * each decodable image ([[imageHashes]]) and find all pairs within
    * `maxHamming` bits via the generic pigeonhole band join
    * ([[Dedup.hammingPairs]] — exact, no cross join). 100 TB shape: the
    * hash pass is embarrassingly parallel over image bytes; the pair stage
    * moves 8-byte hashes only, never pixels.
    *
    * @return (id_a, id_b, hamming) over asset ids, hamming ≤ maxHamming
    */
  def imageNearDups(assets: Dataset[Asset], maxHamming: Int = 6): DataFrame =
    Dedup.hammingPairs(imageHashes(assets).filter(col("dhash").isNotNull),
      maxHamming, "asset_id", "dhash")

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

  /** Real-image corpus bound to a documents table: one 9×8 grayscale
    * BMP per doc ([[bmpBytes]] — byte-math generation, real ImageIO
    * decode; one pixel per dHash grid cell), pixel pattern keyed by
    * `doc_id div 4` with one strongly-perturbed cell per non-zero member —
    * so every group of 4 is a planted near-dup cluster (a perturbed cell
    * moves at most its 2 adjacent gradient comparisons → pairwise dHash
    * hamming ≤ 4) while distinct groups get independent pseudo-random
    * patterns (expected hamming ~32, no accidental near pairs). Every
    * payload decodes through the real ImageIO path (BMP reader).
    */
  def imagesFromDocuments(docs: DataFrame,
                          idCol: String = "doc_id"): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val g = id / 4
      val m = (id % 4).toInt
      val tweak = if (m == 0) -1 else (m * 29) % 72
      val bytes = bmpBytes(9, 8, (x, y) => {
        val c = y * 9 + x
        // splitmix-style mix so per-(group, cell) luminance is genuinely
        // pseudo-random — a plain mod-256 progression leaves cross-group
        // hashes only a phase shift apart, close enough to collide
        val x0 = g * 0x9E3779B97F4A7C15L + (c + 1) * 0xBF58476D1CE4E5B9L
        val x1 = (x0 ^ (x0 >>> 31)) * 0x94D049BB133111EBL
        val base = ((x1 ^ (x1 >>> 29)) & 0xff).toInt
        val v = if (c == tweak) (base + 128) % 256 else base
        (v << 16) | (v << 8) | v
      })
      Asset(id, "image", bytes, "image/bmp", 9, 8, 0L)
    }
  }

  /** Deterministic sawtooth test signal: sample t = (t mod period)/period
    * scaled to [-1, 1). Pure rational arithmetic (no transcendentals), so
    * a SQL oracle can regenerate it bit-exactly with the same IEEE-double
    * operations.
    */
  def sawtoothSamples(n: Int, period: Int): Array[Float] = {
    require(period > 0)
    Array.tabulate(n)(t => ((t % period).toDouble / period * 2.0 - 1.0).toFloat)
  }

  /** Deterministic synthetic asset table for tests/demos. Image assets are
    * REAL PNGs (deterministic per-id pixel pattern) exercising the ImageIO
    * decode path; audio assets are REAL 16-bit PCM WAVs (per-id sawtooth)
    * exercising the hand-rolled RIFF decode path; video payloads stay
    * opaque byte patterns for the declared stub path.
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
        else if (modality == "audio")
          wavBytes(8000,
            sawtoothSamples(400 + (id % 5).toInt * 100, 20 + (id % 10).toInt))
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
