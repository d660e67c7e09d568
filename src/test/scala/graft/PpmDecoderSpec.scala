package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.PpmDecoder

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
}
