package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.BmpDecoder

/** The uncompressed-BMP contract legs the fixed-shape m11 query can't
  * reach: top-down row order, padded strides, 32-bit BGRX, pixel-data
  * offset gaps, and the malformed family (all → null, never a
  * partial decode). */
class BmpDecoderSpec extends AnyFunSuite {

  /** Build a BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
    * optional gap + rows (caller supplies raw row bytes incl. pad). */
  private def bmp(w: Int, h: Int, bpp: Int, rows: Array[Byte],
      gap: Int = 0, compression: Int = 0, planes: Int = 1): Array[Byte] = {
    val offset = 54 + gap
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write('B'); out.write('M')
    le32(offset + rows.length); le32(0); le32(offset)
    le32(40); le32(w); le32(h); le16(planes); le16(bpp)
    le32(compression); le32(rows.length); le32(0); le32(0); le32(0); le32(0)
    for (_ <- 0 until gap) out.write(0xAB)
    out.write(rows)
    out.toByteArray
  }

  test("bottom-up and top-down decode to the same means and dims") {
    // 2×2, 24bpp: rows are 6 bytes + 2 pad. distinct per-pixel BGR.
    val rowA = Array[Byte](10, 20, 30, 40, 50, 60, 0, 0) // y=0 on screen
    val rowB = Array[Byte](70, 80, 90, 100, 110, 120, 0, 0)
    val bottomUp = bmp(2, 2, 24, rowB ++ rowA)  // file stores bottom row first
    val topDown = {
      val b = bmp(2, 2, 24, rowA ++ rowB)
      // height := -2 (LE int32 at offset 22)
      b(22) = (-2 & 0xFF).toByte; b(23) = 0xFF.toByte
      b(24) = 0xFF.toByte; b(25) = 0xFF.toByte
      b
    }
    val fu = BmpDecoder.features(bottomUp)
    val fd = BmpDecoder.features(topDown)
    assert(fu != null && fd != null)
    assert(fu.toSeq == fd.toSeq) // channel means are orientation-free
    assert(fu(0) == 2f && fu(1) == 2f)
    // mean_b = (10+40+70+100)/(4·255), mean_r = (30+60+90+120)/(4·255)
    assert(math.abs(fu(4) - 220.0 / (4 * 255.0)) < 1e-6)
    assert(math.abs(fu(2) - 300.0 / (4 * 255.0)) < 1e-6)
  }

  test("row padding: 3-px rows (9 bytes) stride to 12; pad bytes never " +
      "reach the sums") {
    val row = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 127, 127, 127)
    val f = BmpDecoder.features(bmp(3, 1, 24, row))
    assert(f != null)
    assert(f(4) == BigDecimal((1 + 4 + 7) / (3 * 255.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat)
  }

  test("32-bit BGRX reads 4-byte pixels and ignores the X byte") {
    val row = Array[Byte](10, 20, 30, 99, 50, 60, 70, 99) // 2 px, no pad
    val f = BmpDecoder.features(bmp(2, 1, 32, row))
    assert(f != null)
    assert(math.abs(f(4) - (10 + 50) / (2 * 255.0)) < 1e-6) // blue
    assert(math.abs(f(2) - (30 + 70) / (2 * 255.0)) < 1e-6) // red
  }

  test("pixel-data offset gap is honored") {
    val row = Array[Byte](5, 5, 5, 0)
    val f = BmpDecoder.features(bmp(1, 1, 24, row, gap = 10))
    assert(f != null && f(2) == BigDecimal(5 / 255.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat)
  }

  test("m11's in-plan header builder emits full 4-byte LE fields — a " +
      "70k-char document round-trips through the real decoder") {
    // the first le32 cut emitted only two significant bytes, capping
    // header fields at 65535: a long document's file size / image
    // size corrupted and the decoder nulled out while the SQL oracle
    // kept computing — this leg pins the full-width encoding
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "bmp-long").toString
      val longText = ("lorem ipsum " * 6000).trim // 71,999 chars
      Seq((1L, longText, "en", "web"), (2L, "short", "en", "web"))
        .toDF("doc_id", "text", "lang", "source")
        .write.parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("m11_bmp_features")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      // h = floor(71999/48) = 1499 -> file size 54 + 1499*48 = 72006
      // (> 65535 in BOTH the size and image-size fields)
      assert(out(1L) == (16L, 1499L), s"long doc decoded as ${out(1L)}")
      assert(out(2L) == (16L, 1L))
    } finally spark.stop()
  }

  test("malformed family decodes to null, never a partial row") {
    val good = bmp(2, 1, 24, Array[Byte](1, 2, 3, 4, 5, 6, 0, 0))
    assert(BmpDecoder.features(good) != null)
    assert(BmpDecoder.features(Array.empty[Byte]) == null)
    assert(BmpDecoder.features("not a bitmap".getBytes) == null)
    assert(BmpDecoder.features(good.take(53)) == null)        // truncated hdr
    assert(BmpDecoder.features(good.dropRight(1)) == null)    // short raster
    assert(BmpDecoder.features(
      bmp(2, 1, 24, Array[Byte](1, 2, 3, 4, 5, 6, 0, 0),
        compression = 1)) == null)                            // RLE8
    assert(BmpDecoder.features(
      bmp(2, 1, 16, Array[Byte](1, 2, 3, 4))) == null)        // 16bpp
    assert(BmpDecoder.features(
      bmp(2, 1, 24, Array[Byte](1, 2, 3, 4, 5, 6, 0, 0),
        planes = 2)) == null)
    val badOffset = good.clone()
    badOffset(10) = 0xFF.toByte; badOffset(11) = 0x7F.toByte  // offset > n
    assert(BmpDecoder.features(badOffset) == null)
    val zeroH = good.clone()
    zeroH(22) = 0; zeroH(23) = 0; zeroH(24) = 0; zeroH(25) = 0
    assert(BmpDecoder.features(zeroH) == null)
  }
}
