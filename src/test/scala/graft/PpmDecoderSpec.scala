package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.{ppmDhash, PpmDecoder}

/** Pure-JVM gate for the real P6 decoder: the full netpbm header
  * grammar (whitespace, comments, maxval), both sample widths, and
  * the malformed-input → null contract. */
class PpmDecoderSpec extends AnyFunSuite {

  private def ppm(header: String, raster: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ raster

  test("decodes a minimal P6 and computes exact channel means") {
    // 2x1 pixels: (10, 20, 30), (30, 40, 50)
    val f = PpmDecoder.features(
      ppm("P6\n2 1\n255\n", Array[Byte](10, 20, 30, 30, 40, 50)))
    assert(f != null)
    assert(f(0) == 2f && f(1) == 1f)
    // meanR = (10+30)/2/255 = 0.078431..., rounded HALF_UP to 6
    assert(f(2) == 0.078431f && f(3) == 0.117647f && f(4) == 0.156863f)
  }

  test("header grammar: comments, tabs/CR whitespace, multi-digit dims") {
    val raster = Array.fill[Byte](12 * 1 * 3)(100)
    val f = PpmDecoder.features(
      ppm("P6 # a comment\n\t12\r\n# another\n 1 \t255\n", raster))
    assert(f != null && f(0) == 12f && f(1) == 1f)
    assert(f(2) == 0.392157f) // 100/255 rounded
  }

  test("maxval above 255 switches to big-endian 2-byte samples") {
    // 1x1 pixel, maxval 65535: R=0x0100=256, G=0x0200=512, B=0x0300=768
    val f = PpmDecoder.features(ppm("P6\n1 1\n65535\n",
      Array[Byte](1, 0, 2, 0, 3, 0)))
    assert(f != null)
    assert(f(2) == 0.003906f && f(3) == 0.007813f && f(4) == 0.011719f)
  }

  test("malformed inputs return null, never throw") {
    val good = ppm("P6\n2 1\n255\n", Array[Byte](1, 2, 3, 4, 5, 6))
    assert(PpmDecoder.features(good) != null)
    // bad magic (P5 is graymap, not pixmap)
    assert(PpmDecoder.features(
      ppm("P5\n2 1\n255\n", Array[Byte](1, 2, 3, 4, 5, 6))) == null)
    // truncated raster
    assert(PpmDecoder.features(
      ppm("P6\n2 1\n255\n", Array[Byte](1, 2, 3))) == null)
    // zero dimension, zero/over-range maxval, missing token
    assert(PpmDecoder.features(ppm("P6\n0 1\n255\n", Array[Byte](1))) == null)
    assert(PpmDecoder.features(ppm("P6\n1 1\n0\n", Array[Byte](1, 2, 3))) == null)
    assert(PpmDecoder.features(
      ppm("P6\n1 1\n70000\n", Array.fill[Byte](6)(1))) == null)
    assert(PpmDecoder.features("P6\n1".getBytes("US-ASCII")) == null)
    assert(PpmDecoder.features(Array.empty[Byte]) == null)
  }

  test("dHash: identity-grid image packs exactly the hand-computed bits") {
    // 9×7 image, one pixel per grid cell. Row r: gray rises with the
    // column except at column r (a dip) — every right-neighbor
    // comparison is 0 (rising) except the cell just BEFORE the dip,
    // which is brighter than the dip → bit r*8 + (r-1) for r ≥ 1.
    val raster = new Array[Byte](9 * 7 * 3)
    for (r <- 0 until 7; c <- 0 until 9) {
      val v = if (c == r) 0 else (10 * (c + 1))
      for (ch <- 0 until 3) raster((r * 9 + c) * 3 + ch) = v.toByte
    }
    val h = ppmDhash(ppm("P6\n9 7\n255\n", raster))
    assert(h != null)
    val want = (1 to 6).map(r => 1L << (r * 8 + (r - 1))).sum
    assert(h.longValue == want, s"got ${h.longValue.toBinaryString}")
  }

  test("dHash box-downsample: a 2×-scaled image hashes identically, " +
      "and unequal block sizes use exact mean comparison") {
    // the same gradient rendered at 18×14 (every cell a 2×2 block)
    // must produce the identity-grid hash — resize invariance
    val small = new Array[Byte](9 * 7 * 3)
    for (r <- 0 until 7; c <- 0 until 9; ch <- 0 until 3)
      small((r * 9 + c) * 3 + ch) = (10 + 5 * ((c * 7 + r) % 9)).toByte
    val hSmall = ppmDhash(ppm("P6\n9 7\n255\n", small))
    val big = new Array[Byte](18 * 14 * 3)
    for (y <- 0 until 14; x <- 0 until 18; ch <- 0 until 3)
      big((y * 18 + x) * 3 + ch) = small((((y / 2) * 9) + (x / 2)) * 3 + ch)
    val hBig = ppmDhash(ppm("P6\n18 14\n255\n", big))
    assert(hSmall != null && hBig != null && hBig == hSmall)

    // 10×7: column cells split 10 pixels over 9 cells (one 2-wide
    // cell) — the exact cross-product mean comparison must not be
    // fooled by the doubled sum: constant image → hash 0
    val const = Array.fill[Byte](10 * 7 * 3)(77)
    val hc = ppmDhash(ppm("P6\n10 7\n255\n", const))
    assert(hc != null && hc.longValue == 0L)
  }

  test("dHash: sub-grid and malformed images are null; 2-byte samples " +
      "decode through the same path") {
    assert(ppmDhash(ppm("P6\n8 7\n255\n",
      Array.fill[Byte](8 * 7 * 3)(1))) == null) // w < 9
    assert(ppmDhash(ppm("P6\n9 6\n255\n",
      Array.fill[Byte](9 * 6 * 3)(1))) == null) // h < 7
    assert(ppmDhash(ppm("P6\n9 7\n255\n",
      Array.fill[Byte](5)(1))) == null)         // truncated
    assert(ppmDhash(Array.empty[Byte]) == null)
    // 16-bit samples: big-endian values, gradient along columns only
    val r16 = new Array[Byte](9 * 7 * 3 * 2)
    for (r <- 0 until 7; c <- 0 until 9; ch <- 0 until 3) {
      val v = 300 * (c + 1) // > 255 forces real 2-byte decode
      val off = ((r * 9 + c) * 3 + ch) * 2
      r16(off) = (v >> 8).toByte; r16(off + 1) = (v & 0xff).toByte
    }
    val h16 = ppmDhash(ppm("P6\n9 7\n65535\n", r16))
    assert(h16 != null && h16.longValue == 0L) // strictly rising → no bit
  }

  test("wide dHash (17×16, 16 words × 16 bits): identity grid, " +
      "resize invariance, sub-grid null, sign bits clear") {
    import graft.ops.Multimodal.ppmDhashWide
    // one pixel per cell; row r dips at column r → bit r-1 of word r
    val raster = new Array[Byte](17 * 16 * 3)
    for (r <- 0 until 16; c <- 0 until 17) {
      val v = if (c == r) 0 else (5 * (c + 1))
      for (ch <- 0 until 3) raster((r * 17 + c) * 3 + ch) = v.toByte
    }
    val h = ppmDhashWide(ppm("P6\n17 16\n255\n", raster))
    assert(h != null && h.length == 16)
    for (r <- 0 until 16) {
      val want = if (r >= 1) 1L << (r - 1) else 0L
      assert(h(r) == want, s"word $r: got ${h(r).toBinaryString}")
      assert(h(r) >= 0 && h(r) <= 0xFFFFL, s"word $r out of 16-bit range")
    }
    // 2× upscale hashes identically (box-downsample invariance)
    val big = new Array[Byte](34 * 32 * 3)
    for (y <- 0 until 32; x <- 0 until 34; ch <- 0 until 3)
      big((y * 34 + x) * 3 + ch) = raster((((y / 2) * 17) + (x / 2)) * 3 + ch)
    val hBig = ppmDhashWide(ppm("P6\n34 32\n255\n", big))
    assert(hBig != null && hBig.toSeq == h.toSeq)
    // sub-grid and malformed → null
    assert(ppmDhashWide(ppm("P6\n16 16\n255\n",
      Array.fill[Byte](16 * 16 * 3)(1))) == null)
    assert(ppmDhashWide(ppm("P6\n17 15\n255\n",
      Array.fill[Byte](17 * 15 * 3)(1))) == null)
    assert(ppmDhashWide(Array.empty[Byte]) == null)
  }
}
