package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.WavDecoder

/** Pure-JVM gate for the real RIFF/WAVE PCM decoder: the full chunk
  * grammar (word alignment, unknown chunks), both bit depths, stereo,
  * and the malformed-input → null contract — the legs m08's
  * fixed-shape query payloads cannot reach. */
class WavDecoderSpec extends AnyFunSuite {

  import graft.ops.Multimodal.{wavLe16 => le16, wavLe32 => le32}
  private def ascii(s: String) = s.getBytes("US-ASCII")

  private def fmtChunk(channels: Int, rate: Int, bits: Int,
      fmt: Int = 1, blockAlign: Int = -1): Array[Byte] = {
    val ba = if (blockAlign >= 0) blockAlign else channels * bits / 8
    ascii("fmt ") ++ le32(16) ++ le16(fmt) ++ le16(channels) ++
      le32(rate) ++ le32(rate * ba) ++ le16(ba) ++ le16(bits)
  }

  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = ascii("WAVE") ++ chunks.flatten
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  private def dataChunk(samples: Array[Byte]): Array[Byte] =
    ascii("data") ++ le32(samples.length) ++ samples

  test("8-bit mono: exact centered mean-abs, header fields surfaced") {
    // samples 128±{0,64,128}: |v−128| = 0, 64, 127 (255 clamps at 127)
    val f = WavDecoder.features(wav(fmtChunk(1, 8000, 8),
      dataChunk(Array[Byte](128.toByte, 192.toByte, 255.toByte, 0))))
    assert(f != null)
    assert(f(0) == 1f && f(1) == 8000f && f(2) == 4f)
    // (0 + 64 + 127 + 128) / (4·128) = 319/512 = 0.623047 rounded
    assert(f(3) == 0.623047f, f.toSeq)
  }

  test("16-bit stereo: signed LE samples, frames = samples/channels") {
    // L=+16384, R=−16384, L=+32767, R=−32768
    val samples = le16(16384) ++ le16(-16384 & 0xFFFF) ++
      le16(32767) ++ le16(-32768 & 0xFFFF)
    val f = WavDecoder.features(wav(fmtChunk(2, 44100, 16),
      dataChunk(samples)))
    assert(f != null)
    assert(f(0) == 2f && f(1) == 44100f && f(2) == 2f)
    // (16384+16384+32767+32768)/(4·32768) = 98303/131072 = 0.749992
    assert(f(3) == 0.749992f, f.toSeq)
  }

  test("chunk grammar: unknown chunks skipped, odd chunks pad to word") {
    // a LIST chunk with an ODD size before fmt/data — the walker must
    // honor the pad byte or it desynchronizes off the chunk stream
    val list = ascii("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // +pad
    val f = WavDecoder.features(wav(list, fmtChunk(1, 8000, 8),
      dataChunk(Array[Byte](128.toByte, 128.toByte))))
    assert(f != null && f(2) == 2f && f(3) == 0f)
  }

  test("malformed inputs → null, never a throw") {
    val good = wav(fmtChunk(1, 8000, 8), dataChunk(Array[Byte](0, 1)))
    assert(WavDecoder.features(good) != null)
    // bad magic / truncation
    assert(WavDecoder.features(ascii("RIFX") ++ good.drop(4)) == null)
    assert(WavDecoder.features(good.take(10)) == null)
    // non-PCM format code
    assert(WavDecoder.features(wav(fmtChunk(1, 8000, 8, fmt = 3),
      dataChunk(Array[Byte](0)))) == null)
    // unsupported bit depth
    assert(WavDecoder.features(wav(fmtChunk(1, 8000, 24),
      dataChunk(Array[Byte](0, 0, 0)))) == null)
    // blockAlign inconsistent with channels·bytesPerSample
    assert(WavDecoder.features(wav(fmtChunk(1, 8000, 8, blockAlign = 2),
      dataChunk(Array[Byte](0)))) == null)
    // data chunk declares more bytes than the file holds
    val overrun = wav(fmtChunk(1, 8000, 8)) ++ ascii("data") ++ le32(99)
    assert(WavDecoder.features(overrun) == null)
    // 16-bit data whose byte count is not sample-aligned
    assert(WavDecoder.features(wav(fmtChunk(1, 8000, 16),
      dataChunk(Array[Byte](0, 0, 0)))) == null)
    // stereo sample count not divisible by channels
    assert(WavDecoder.features(wav(fmtChunk(2, 8000, 8),
      dataChunk(Array[Byte](0, 0, 0)))) == null)
    // missing data chunk entirely
    assert(WavDecoder.features(wav(fmtChunk(1, 8000, 8))) == null)
  }

  test("empty data chunk: zero frames, zero mean, still well-formed") {
    val f = WavDecoder.features(wav(fmtChunk(1, 8000, 8),
      dataChunk(Array.empty[Byte])))
    assert(f != null && f(2) == 0f && f(3) == 0f)
  }

  test("WavFrameEnergies: exact per-frame integer sums, floor frame " +
      "boundaries on non-divisible counts, 16-bit magnitude, shared " +
      "malformed → null contract") {
    import graft.ops.Multimodal.WavFrameEnergies
    // 8 samples, 4 frames of 2: |v-128| sums per frame hand-counted
    val s8 = Array[Byte](128.toByte, 129.toByte, // 0+1   = 1
      192.toByte, 64,                            // 64+64 = 128
      255.toByte, 0,                             // 127+128 = 255
      128.toByte, 130.toByte)                    // 0+2   = 2
    val e = WavFrameEnergies(4).features(wav(fmtChunk(1, 8000, 8),
      dataChunk(s8)))
    assert(e.toSeq == Seq(1f, 128f, 255f, 2f))
    // 5 samples into 2 frames: floor boundaries [0,2) and [2,5)
    val s5 = Array[Byte](129.toByte, 129.toByte, 129.toByte,
      129.toByte, 130.toByte)
    val e2 = WavFrameEnergies(2).features(wav(fmtChunk(1, 8000, 8),
      dataChunk(s5)))
    assert(e2.toSeq == Seq(2f, 4f))
    // 16-bit signed magnitudes: -3 and +5 → frames [3, 5]
    val s16 = le16(-3 & 0xFFFF) ++ le16(5)
    val e3 = WavFrameEnergies(2).features(wav(fmtChunk(1, 8000, 16),
      dataChunk(s16)))
    assert(e3.toSeq == Seq(3f, 5f))
    // malformed input → null, same contract as WavDecoder
    assert(WavFrameEnergies(4).features("junk".getBytes) == null)
    assert(WavFrameEnergies(4).features(wav(fmtChunk(1, 8000, 12),
      dataChunk(Array[Byte](0, 0)))) == null)
  }
}
