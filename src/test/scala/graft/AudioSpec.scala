package graft

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the hand-rolled RIFF/WAVE PCM codec path: decode of
  * every supported sample format, writer/decoder roundtrip with the exact
  * quantization the contract oracle reproduces in SQL, linear-interp
  * resample (including the exact-decimation regime the contract query
  * certifies), and the real-vs-stub feature routing in extractFeatures.
  */
class AudioSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("audio-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // Hand-build a WAV with explicit header fields so the decoder is tested
  // against the RIFF spec, not against our own writer.
  private def rawWav(fmt: Int, channels: Int, rate: Int, bits: Int,
                     data: Array[Byte], trailer: Array[Byte] = Array.empty): Array[Byte] = {
    val pad = data.length & 1
    val chunks = (8 + 16) + (8 + data.length + pad) + trailer.length
    val buf = java.nio.ByteBuffer.allocate(12 + chunks)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(4 + chunks); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(fmt.toShort); buf.putShort(channels.toShort)
    buf.putInt(rate); buf.putInt(rate * channels * bits / 8)
    buf.putShort((channels * bits / 8).toShort); buf.putShort(bits.toShort)
    buf.put("data".getBytes); buf.putInt(data.length); buf.put(data)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  test("decode 16-bit mono: exact sample values") {
    val shorts = Array[Short](0, 16384, -16384, 32767, -32768)
    val data = java.nio.ByteBuffer.allocate(shorts.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shorts.foreach(data.putShort)
    val w = Multimodal.tryDecodeWav(rawWav(1, 1, 8000, 16, data.array())).get
    assert(w.sampleRate == 8000 && w.channels == 1)
    assert(w.samples.sameElements(
      Array(0.0f, 0.5f, -0.5f, 32767 / 32768.0f, -1.0f)))
  }

  test("decode 8-bit unsigned and 24/32-bit signed") {
    val w8 = Multimodal.tryDecodeWav(
      rawWav(1, 1, 8000, 8, Array[Byte](128.toByte, 0, 255.toByte))).get
    assert(w8.samples.sameElements(Array(0.0f, -1.0f, 127 / 128.0f)))

    // 24-bit: 0x400000 = +0.5, 0xC00000 sign-extends to -0.5
    val d24 = Array[Byte](0, 0, 0x40, 0, 0, 0xc0.toByte)
    val w24 = Multimodal.tryDecodeWav(rawWav(1, 1, 8000, 24, d24)).get
    assert(w24.samples.sameElements(Array(0.5f, -0.5f)))

    val d32 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    d32.putInt(1 << 30); d32.putInt(Int.MinValue)
    val w32 = Multimodal.tryDecodeWav(rawWav(1, 1, 8000, 32, d32.array())).get
    assert(w32.samples.sameElements(Array(0.5f, -1.0f)))
  }

  test("decode float32 and stereo mixdown") {
    val df = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    df.putFloat(0.25f); df.putFloat(-0.75f)
    val wf = Multimodal.tryDecodeWav(rawWav(3, 1, 44100, 32, df.array())).get
    assert(wf.samples.sameElements(Array(0.25f, -0.75f)))

    // stereo 16-bit: frames (L=0.5, R=-0.5) -> 0, (L=0.5, R=0.5) -> 0.5
    val ds = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ds.putShort(16384); ds.putShort(-16384.toShort)
    ds.putShort(16384); ds.putShort(16384)
    val ws = Multimodal.tryDecodeWav(rawWav(1, 2, 22050, 16, ds.array())).get
    assert(ws.channels == 2)
    assert(ws.samples.sameElements(Array(0.0f, 0.5f)))
  }

  test("malformed payloads decode to None (stub fallback)") {
    assert(Multimodal.tryDecodeWav(null).isEmpty)
    assert(Multimodal.tryDecodeWav("not a wav at all, but long enough to pass the length check".getBytes).isEmpty)
    // truncated data chunk (declared size beyond the payload)
    val good = rawWav(1, 1, 8000, 16, Array[Byte](0, 0, 0, 0))
    assert(Multimodal.tryDecodeWav(good.dropRight(2)).isEmpty)
    // compressed format code
    assert(Multimodal.tryDecodeWav(rawWav(85, 1, 8000, 16, Array[Byte](0, 0))).isEmpty)
  }

  test("writer/decoder roundtrip applies floor(x*32767+0.5)/32768 quantization") {
    val src = Array(0.0f, 0.3f, -0.3f, 0.999f, -1.0f, 1.0f /* clamps */)
    val w = Multimodal.tryDecodeWav(Multimodal.wavBytes(16000, src)).get
    assert(w.sampleRate == 16000)
    val expected = src.map { x =>
      val q = math.max(-32768, math.min(32767, math.floor(x * 32767.0 + 0.5)))
      (q / 32768.0).toFloat
    }
    assert(w.samples.sameElements(expected))
  }

  test("resampleLinear: exact decimation when dst divides src; interp golden") {
    val s = Array(0.0f, 1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f)
    // 2:1 decimation — every other sample, no interpolation error
    assert(Multimodal.resampleLinear(s, 8000, 4000)
      .sameElements(Array(0.0f, 2.0f, 4.0f, 6.0f)))
    // 4:3 upmix of positions: j*4/3 -> 0, 4/3, 8/3, 4, ...
    val up = Multimodal.resampleLinear(Array(0.0f, 3.0f, 6.0f, 9.0f), 4, 3)
    assert(up.length == 3)
    assert(math.abs(up(0) - 0.0f) < 1e-6)
    assert(math.abs(up(1) - 4.0f) < 1e-6)  // pos 4/3: 3 + (1/3)*3
    assert(math.abs(up(2) - 8.0f) < 1e-6)  // pos 8/3: 6 + (2/3)*3
  }

  test("audioFeatures buckets RMS; zeroCrossings counts sign flips") {
    // 4 samples in 2 buckets: rms([1,1])=1, rms([0.5,-0.5])=0.5
    val f = Multimodal.audioFeatures(Array(1.0f, 1.0f, 0.5f, -0.5f), 2)
    assert(math.abs(f(0) - 1.0f) < 1e-6 && math.abs(f(1) - 0.5f) < 1e-6)
    assert(Multimodal.zeroCrossings(Array(1.0f, -1.0f, 1.0f, 1.0f, -0.5f)) == 3)
    // zero counts as non-negative: -1 -> 0 flips, 0 -> 1 doesn't
    assert(Multimodal.zeroCrossings(Array(-1.0f, 0.0f, 1.0f)) == 1)
  }

  test("extractFeatures routes audio through the real decoder") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val audio = assets.filter(_.modality == "audio").collect()
    assert(audio.nonEmpty)
    val feats = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.feature).toMap
    audio.foreach { a =>
      val w = Multimodal.tryDecodeWav(a.bytes).get // synthetic audio IS wav
      val expected = Multimodal.audioFeatures(w.samples, 8)
      assert(feats(a.asset_id).sameElements(expected))
      // and it differs from what the stub would have produced
      assert(!feats(a.asset_id).sameElements(Multimodal.decodeStub(a.bytes, 8)))
    }
  }

  test("resampleAudio halves the sample count and re-encodes playable wav") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val srcCounts = assets.filter(_.modality == "audio").collect()
      .map(a => a.asset_id -> Multimodal.tryDecodeWav(a.bytes).get.samples.length)
      .toMap
    val res = Multimodal.resampleAudio(assets, 4000).collect()
    assert(res.map(_.asset_id).toSet == srcCounts.keySet)
    res.foreach { r =>
      assert(r.sample_rate == 4000)
      assert(r.n_samples == srcCounts(r.asset_id) / 2)
      val back = Multimodal.tryDecodeWav(r.bytes).get
      assert(back.sampleRate == 4000 && back.samples.length == r.n_samples)
    }
  }
}
