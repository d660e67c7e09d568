package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched over partitions.
  *
  * Decoders behind the [[MediaDecoder]] seam: [[PpmDecoder]] is a
  * REAL parser for binary PPM (P6) — the raster format a codec-less
  * container can still decode honestly, oracled end-to-end by m03 —
  * and [[FakeDecoder]] is the deterministic byte-histogram stand-in
  * for formats whose codecs the container doesn't ship (JPEG, audio,
  * video). Everything around the seam (schema, binary slicing,
  * partition batching, feature vector shape) is identical either
  * way: a production deployment swaps `decoder` for one that calls
  * an actual codec, nothing else changes.
  *
  * Scale: media bytes never leave executors, all transforms are
  * per-row/per-partition (no shuffle); frame sampling is pure
  * expression work (binary substring), and feature extraction batches
  * rows per partition exactly like an inference step would.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("sha256", StringType)))

  /** Wrap a binary payload column with typed metadata. */
  def asMedia(payload: Column, kind: String): Column =
    struct(
      payload.as("bytes"),
      struct(lit(kind).as("kind"),
        length(payload).cast("long").as("n_bytes"),
        lower(sha2(payload, 256)).as("sha256")).as("meta"))

  /** Fixed-size frame sampling over a binary payload (expression-only:
    * binary substring, no decode). 1-based positions, last frame may
    * be short. */
  def sampleFrames(payload: Column, frameSize: Int): Column = {
    val n = length(payload)
    val frames = transform(
      sequence(lit(0), ceil(n.cast("double") / frameSize).cast("int") - 1),
      i => substring_index_bytes(payload, i, frameSize))
    // empty payload: sequence(0, -1) would step backwards to [0, -1]
    // and fabricate two frames; ceil(0/f) = 0 frames is the contract
    when(n > 0, frames)
      .when(n === 0, array().cast(ArrayType(BinaryType)))
  }

  private def substring_index_bytes(payload: Column, i: Column, frameSize: Int) =
    payload.substr(i * frameSize + 1, lit(frameSize))

  /** STUB of the real media decode: deterministic 16-dim byte
    * histogram (high-nibble buckets, L1-normalized). A real deployment
    * replaces this with an actual image/audio decoder; the signature
    * (bytes → float features) is the contract. */
  trait MediaDecoder extends Serializable {
    def features(bytes: Array[Byte]): Array[Float]
  }

  object FakeDecoder extends MediaDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xF0) >> 4) += 1f
        i += 1
      }
      if (bytes.length > 0) {
        var j = 0
        while (j < 16) { hist(j) /= bytes.length; j += 1 }
      }
      hist
    }
  }

  /** REAL pure-JVM decoder for binary PPM (P6) — the one raster
    * format a codec-less container can still decode honestly: ASCII
    * header (`P6`, width, height, maxval, `#` comments, arbitrary
    * whitespace) followed by a big-endian raster of w·h RGB samples
    * (1 byte per channel for maxval < 256, 2 bytes above — the full
    * netpbm contract, not a fixture-shaped subset).
    *
    * Features: `[w, h, meanR, meanG, meanB]` with channel means
    * maxval-normalized to [0,1] and rounded HALF_UP to 6 decimals
    * (exactly representable back from float32, so a downstream
    * `cast(double)` recovers the rounded value bit-for-bit — what
    * lets m03's DuckDB oracle recompute them from the same bytes).
    * Channel sums accumulate in long (exact — no float-order
    * sensitivity), means divide once in double. Anything that is not
    * a complete, well-formed P6 (bad magic, missing tokens, zero or
    * over-range maxval, truncated raster) → null, the same contract
    * as a failed codec call. */
  /** Shared P6 header parse: `[w, h, maxval, rasterOffset, perSample]`
    * with the complete-raster length check, or null for anything that
    * is not a well-formed P6 — the one parsing of the netpbm grammar
    * [[PpmDecoder]] and [[ppmDhash]] both read through. */
  private[ops] def ppmHeader(bytes: Array[Byte]): Array[Long] = {
    var i = 0
    val n = bytes.length
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // skip whitespace and '#'-to-EOL comments before a token
    def skip(): Unit = {
      var more = true
      while (more && i < n) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') {
          while (i < n && bytes(i) != '\n') i += 1
        } else more = false
      }
    }
    def int(): Long = { // -1 = malformed
      skip()
      var v = 0L; var any = false
      while (i < n && bytes(i) >= '0' && bytes(i) <= '9' && v <= 65535) {
        v = v * 10 + (bytes(i) - '0'); any = true; i += 1
      }
      if (!any || v > 65535) -1L else v
    }
    if (n < 2 || bytes(0) != 'P' || bytes(1) != '6') return null
    i = 2
    val w = int(); val h = int(); val maxval = int()
    if (w <= 0 || h <= 0 || maxval <= 0) return null
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= n || !isWs(bytes(i))) return null
    i += 1
    val perSample = if (maxval < 256) 1L else 2L
    if (n - i < w * h * 3 * perSample) return null
    Array(w, h, maxval, i.toLong, perSample)
  }

  object PpmDecoder extends MediaDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val hdr = ppmHeader(bytes)
      if (hdr == null) return null
      val w = hdr(0); val h = hdr(1); val maxval = hdr(2)
      val perSample = hdr(4).toInt
      var i = hdr(3).toInt
      val npix = w * h
      val sums = new Array[Long](3)
      var p = 0L
      while (p < npix * 3) {
        val v =
          if (perSample == 1) bytes(i) & 0xFF
          else ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
        sums((p % 3).toInt) += v
        i += perSample
        p += 1
      }
      def mean(c: Int): Float =
        BigDecimal(sums(c).toDouble / (npix.toDouble * maxval))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat
      Array(w.toFloat, h.toFloat, mean(0), mean(1), mean(2))
    }
  }

  /** REAL pure-JVM decoder for uncompressed Windows bitmaps — the
    * third honest codec next to P6 and RIFF/WAVE (BI_RGB is header +
    * raw pixel rows, the same no-external-libs class). Complete
    * contract for the uncompressed subset: 'BM' magic, pixel-data
    * offset honored (arbitrary gap ≥ the 54-byte headers), any DIB
    * header ≥ BITMAPINFOHEADER (40/52/56/108/124), 24-bit BGR and
    * 32-bit BGRX, bottom-up (positive height) AND top-down (negative
    * height) row order, rows padded to 4-byte boundaries, planes=1,
    * BI_RGB compression only. Anything else — RLE/bitfields
    * compression, 1/4/8/16-bit palette depths, truncated pixel data,
    * offset past EOF — decodes to null, never a partial row.
    *
    * Features: `[w, h, mean_r, mean_g, mean_b]` (h reported as the
    * magnitude; orientation changes row ORDER, which channel means
    * are invariant to, but the decoder still walks the declared
    * layout). Same m03 rounding discipline: exact long channel sums,
    * one double division by npix·255, HALF_UP to 6 decimals. */
  object BmpDecoder extends MediaDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val n = bytes.length
      if (n < 54 || bytes(0) != 'B' || bytes(1) != 'M') return null
      def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      def i32(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
      val offset = i32(10)
      val dibSize = i32(14)
      if (dibSize < 40 || offset < 14 + dibSize || offset > n) return null
      val w = i32(18)
      val hRaw = i32(22)
      val h = math.abs(hRaw.toLong)
      if (w <= 0 || hRaw == 0 || h > 65535 || w > 65535) return null
      if (u16(26) != 1) return null // planes
      val bpp = u16(28)
      if (bpp != 24 && bpp != 32) return null
      if (i32(30) != 0) return null // BI_RGB only
      val bytesPerPx = bpp / 8
      val stride = ((w * bytesPerPx + 3) / 4) * 4
      if (n - offset < stride * h) return null
      val sums = new Array[Long](3) // r, g, b
      var y = 0L
      while (y < h) {
        var rowOff = offset + (y * stride).toInt
        var x = 0
        while (x < w) {
          sums(2) += bytes(rowOff) & 0xFF     // blue first on disk
          sums(1) += bytes(rowOff + 1) & 0xFF
          sums(0) += bytes(rowOff + 2) & 0xFF
          rowOff += bytesPerPx
          x += 1
        }
        y += 1
      }
      val npix = w.toLong * h
      def mean(c: Int): Float =
        BigDecimal(sums(c).toDouble / (npix.toDouble * 255.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat
      Array(w.toFloat, h.toFloat, mean(0), mean(1), mean(2))
    }
  }

  /** 56-bit perceptual difference hash (dHash) of a P6 image: the
    * raster grayscales (R+G+B per pixel — no luma weights, so every
    * step stays exact integer math), box-downsamples onto a 9×7 cell
    * grid, and each of the 8 horizontally-adjacent cell comparisons
    * per row contributes one bit (left cell brighter → 1) at bit
    * index `row*8 + col`. 56 bits — not the classic 64 — keeps the
    * packed value positive, so engines with checked shifts (DuckDB
    * rejects `1::BIGINT << 63`) recompute it verbatim. Cell means
    * compare as exact integer cross-products (sumA·nB vs sumB·nA in
    * BigInt — 126 driver-free multiplications per image, never a
    * float), so the hash is bit-deterministic on any input. Images
    * smaller than the grid (w < 9 or h < 7) have no defined
    * downsample → null, like any malformed payload. */
  def ppmDhash(bytes: Array[Byte]): java.lang.Long = {
    val hdr = ppmHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0); val h = hdr(1)
    val perSample = hdr(4).toInt
    if (w < 9 || h < 7) return null
    val gw = 9; val gh = 7
    val sums = Array.ofDim[Long](gh, gw)
    val cnts = Array.ofDim[Long](gh, gw)
    var i = hdr(3).toInt
    var y = 0L
    while (y < h) {
      val cy = (y * gh / h).toInt
      var x = 0L
      while (x < w) {
        val cx = (x * gw / w).toInt
        var g = 0L
        var c = 0
        while (c < 3) {
          g +=
            (if (perSample == 1) bytes(i) & 0xFF
             else ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF))
          i += perSample
          c += 1
        }
        sums(cy)(cx) += g; cnts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < 8) {
        val lhs = BigInt(sums(r)(c)) * cnts(r)(c + 1)
        val rhs = BigInt(sums(r)(c + 1)) * cnts(r)(c)
        if (lhs > rhs) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Batched perceptual hashing: (id, bytes) → (id, sig) — the
    * signature relation [[graft.ops.Dedup.hammingPairs]] consumes for
    * image near-dup detection; null payloads and undecodable blobs
    * hash to null (dropped by the pair join's banding, like empty
    * shingle sets). Same per-partition batch shape as
    * [[extractFeatures]]. */
  def dhashOf(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("sig", LongType)))
    val input = df.select(col(idCol).cast("long"), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), if (bytes == null) null else ppmDhash(bytes))
      }
    }(Encoders.row(schema))
  }

  /** 256-bit wide difference hash — the billion-image path the m09
    * boundary documents: 56 bits of signature entropy cap the usable
    * hamming radius (radius 4 read 48× at 100×), so the wide grid
    * (17×16 cells → 16 comparisons × 16 rows) carries the radius the
    * narrow hash couldn't hold. Packed as SIXTEEN 16-bit words (one
    * per grid row, array<long>): [[graft.ops.Dedup.hammingPairsWide]]
    * bands maxHamming+1 word-aligned multi-row blocks over them
    * (48-64 bits/band at radius 4 vs the narrow hash's 11 — the
    * birthday bound that actually broke), and every word stays far
    * from the sign bit so a checked-shift SQL engine recomputes it
    * verbatim.
    * Same exact-integer discipline as [[ppmDhash]]: grayscale =
    * R+G+B, box means compared as cross-products, never a float.
    * Null for anything that isn't a complete P6 at least 17×16. */
  def ppmDhashWide(bytes: Array[Byte]): Array[Long] = {
    val hdr = ppmHeader(bytes)
    if (hdr == null) return null
    val w = hdr(0); val h = hdr(1)
    val perSample = hdr(4).toInt
    val gw = 17; val gh = 16
    if (w < gw || h < gh) return null
    val sums = Array.ofDim[Long](gh, gw)
    val cnts = Array.ofDim[Long](gh, gw)
    var i = hdr(3).toInt
    var y = 0L
    while (y < h) {
      val cy = (y * gh / h).toInt
      var x = 0L
      while (x < w) {
        val cx = (x * gw / w).toInt
        var g = 0L
        var c = 0
        while (c < 3) {
          g +=
            (if (perSample == 1) bytes(i) & 0xFF
             else ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF))
          i += perSample
          c += 1
        }
        sums(cy)(cx) += g; cnts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    val words = new Array[Long](gh)
    var r = 0
    while (r < gh) {
      var word = 0L
      var c = 0
      while (c < gw - 1) {
        val lhs = BigInt(sums(r)(c)) * cnts(r)(c + 1)
        val rhs = BigInt(sums(r)(c + 1)) * cnts(r)(c)
        if (lhs > rhs) word |= 1L << c
        c += 1
      }
      words(r) = word
      r += 1
    }
    words
  }

  /** Batched wide hashing: (id, bytes) → (id, sig array<long>) for
    * [[graft.ops.Dedup.hammingPairsWide]]. */
  def dhashWideOf(df: DataFrame, idCol: String,
      bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("sig", ArrayType(LongType))))
    val input = df.select(col(idCol).cast("long"), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0),
          if (bytes == null) null else ppmDhashWide(bytes))
      }
    }(Encoders.row(schema))
  }

  /** REAL pure-JVM decoder for RIFF/WAVE PCM — the audio counterpart
    * of [[PpmDecoder]]: full chunk-walking contract (word-aligned
    * chunks with pad bytes, unknown chunks skipped, `fmt ` + `data`
    * required, PCM format 1 only, 8-bit unsigned / 16-bit signed LE,
    * blockAlign cross-checked against channels·bytesPerSample), not a
    * fixture-shaped subset.
    *
    * Features: `[channels, sample_rate, n_frames, mean_abs]` where
    * mean_abs is the mean absolute amplitude over ALL samples,
    * full-scale-normalized to [0,1] (|v−128|/128 for 8-bit,
    * |v|/32768 for 16-bit) and rounded HALF_UP to 6 decimals —
    * accumulated in exact long sums with one double division, the
    * m03 discipline that lets a SQL oracle recompute it bit-for-bit
    * through `cast(double)`. Anything not a complete well-formed
    * PCM WAVE (bad magic, non-PCM, unsupported bit depth, truncated
    * or misaligned data) → null, the failed-codec contract. */
  /** Little-endian field writers — the encode side of [[WavDecoder]]'s
    * reader, shared by everything that BUILDS wave bytes (the m08
    * payload constructor, WavDecoderSpec's fixtures) so the write and
    * read layouts cannot drift apart. */
  def wavLe16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  def wavLe32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Shared RIFF/WAVE PCM header parse: `[channels, rate, bits,
    * dataOff, dataLen]` with the full malformed-input contract
    * (null), the one parsing of the wave grammar [[WavDecoder]] and
    * [[WavFrameEnergies]] both read through — the [[ppmHeader]]
    * discipline for audio. */
  private[ops] def wavHeader(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    def u8(i: Int) = bytes(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      bytes(i) == s(0).toByte && bytes(i + 1) == s(1).toByte &&
        bytes(i + 2) == s(2).toByte && bytes(i + 3) == s(3).toByte
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var i = 12L
    var fmtOk = false
    var channels = 0; var rate = 0L; var bits = 0; var blockAlign = 0
    var dataOff = -1L; var dataLen = 0L
    while (i + 8 <= n) {
      val body = i + 8
      val sz = le32(i.toInt + 4)
      if (tag(i.toInt, "fmt ")) {
        if (sz < 16 || body + 16 > n) return null
        if (le16(body.toInt) != 1) return null // PCM only
        channels = le16(body.toInt + 2)
        rate = le32(body.toInt + 4)
        blockAlign = le16(body.toInt + 12)
        bits = le16(body.toInt + 14)
        fmtOk = true
      } else if (tag(i.toInt, "data")) {
        dataOff = body; dataLen = sz
      }
      i = body + sz + (sz & 1L) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || channels <= 0 || rate <= 0) return null
    if (bits != 8 && bits != 16) return null
    val bps = bits / 8
    if (blockAlign != channels * bps) return null
    if (dataOff + dataLen > n) return null
    val nSamples = dataLen / bps
    if (dataLen % bps != 0 || nSamples % channels != 0) return null
    Array(channels.toLong, rate, bits.toLong, dataOff, dataLen)
  }

  object WavDecoder extends MediaDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = wavHeader(bytes)
      if (h == null) return null
      val Array(channels, rate, bits, dataOff, dataLen) = h
      def u8(i: Int) = bytes(i) & 0xFF
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      val bps = (bits / 8).toInt
      val nSamples = dataLen / bps
      val nFrames = nSamples / channels
      var sum = 0L
      var j = 0L
      while (j < nSamples) {
        val off = (dataOff + j * bps).toInt
        sum += (if (bits == 8) math.abs(u8(off) - 128)
                else math.abs(le16(off).toShort.toInt))
        j += 1
      }
      val full = if (bits == 8) 128.0 else 32768.0
      val mean =
        if (nSamples == 0) 0f
        else BigDecimal(sum.toDouble / (nSamples.toDouble * full))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat
      Array(channels.toFloat, rate.toFloat, nFrames.toFloat, mean)
    }
  }

  /** Per-frame PCM energy sums for audio fingerprinting: the sample
    * stream splits into `frames` contiguous segments (floor
    * boundaries — segment f covers samples [f·n/F, (f+1)·n/F)) and
    * each reports its EXACT integer sum of absolute amplitudes
    * (|v−128| for 8-bit, |v| for 16-bit). Raw long sums, not
    * normalized means: the fingerprint downstream compares
    * NEIGHBORING frames, and integer sums make that comparison
    * engine-exact (a rounded float mean could flip a near-tie bit
    * between engines). Exact while a frame's sum < 2²⁴ (float32
    * mantissa) — ~130 k samples/frame at 8-bit full scale, far above
    * the fingerprint's operating shape. Same null contract as
    * [[WavDecoder]]. */
  case class WavFrameEnergies(frames: Int) extends MediaDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = wavHeader(bytes)
      if (h == null) return null
      val Array(_, _, bits, dataOff, dataLen) = h
      def u8(i: Int) = bytes(i) & 0xFF
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      val bps = (bits / 8).toInt
      val nSamples = (dataLen / bps).toInt
      val out = new Array[Float](frames)
      var f = 0
      while (f < frames) {
        val lo = (f.toLong * nSamples / frames).toInt
        val hi = ((f + 1).toLong * nSamples / frames).toInt
        var sum = 0L
        var j = lo
        while (j < hi) {
          val off = (dataOff + j.toLong * bps).toInt
          sum += (if (bits == 8) math.abs(u8(off) - 128)
                  else math.abs(le16(off).toShort.toInt))
          j += 1
        }
        out(f) = sum.toFloat
        f += 1
      }
      out
    }
  }

  /** Batched feature extraction: (id, bytes) → (id, features),
    * decoder applied per partition (the inference batch shape). */
  def extractFeatures(df: DataFrame, idCol: String, bytesCol: String,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType))))
    val input = df.select(col(idCol).cast("long"), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        // a real corpus carries null payloads (failed fetches) and
        // undecodable blobs; the decoder sees only real bytes and may
        // itself return null — null features, row preserved
        val bytes = r.getAs[Array[Byte]](1)
        val f = if (bytes == null) null else decoder.features(bytes)
        Row(r.getLong(0), if (f == null) null else f.toSeq)
      }
    }(Encoders.row(schema))
  }
}
