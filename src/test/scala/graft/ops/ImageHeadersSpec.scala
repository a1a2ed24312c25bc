package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Encode/decode round trip for the pure-JVM container codec backing
  * mm_decode_stats — pins the fixed offsets and both endiannesses.
  */
class ImageHeadersSpec extends AnyFunSuite {

  private val body = "the quick brown fox".getBytes("UTF-8")

  test("png round trip, including >255 dims (big-endian fields)") {
    for ((w, h, d) <- Seq((4, 4, 8), (300, 17, 8), (511, 509, 16))) {
      val bytes = ImageHeaders.png(w, h, d, body)
      assert(ImageHeaders.decodeHeader(bytes) === (("png", w, h, d)))
      assert(bytes.length === ImageHeaders.PngOverhead + body.length)
    }
  }

  test("bmp round trip, including >255 dims (little-endian fields)") {
    for ((w, h, d) <- Seq((4, 4, 24), (300, 17, 24), (511, 509, 32))) {
      val bytes = ImageHeaders.bmp(w, h, d, body)
      assert(ImageHeaders.decodeHeader(bytes) === (("bmp", w, h, d)))
      assert(bytes.length === ImageHeaders.BmpOverhead + body.length)
    }
  }

  test("png chunk CRCs verify with java.util.zip (stream is chunk-valid)") {
    val bytes = ImageHeaders.png(12, 34, 8, body)
    // walk chunks after the 8-byte signature; recompute each CRC
    var off = 8
    var sawIend = false
    while (off < bytes.length) {
      val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      val stored = ((bytes(off + 8 + len) & 0xffL) << 24) |
        ((bytes(off + 9 + len) & 0xffL) << 16) |
        ((bytes(off + 10 + len) & 0xffL) << 8) |
        (bytes(off + 11 + len) & 0xffL)
      assert((crc.getValue & 0xffffffffL) === stored)
      val ctype = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
      if (ctype == "IEND") sawIend = true
      off += 12 + len
    }
    assert(sawIend)
    assert(off === bytes.length)
  }

  test("bmpGray writes the real on-disk pixel layout (bottom-up, padded)") {
    // 2×3 image, luminance = 10*x + y. Row size = 2*3 = 6 bytes,
    // padded to 8. Pixel data starts at the header's data offset (54).
    val img = ImageHeaders.bmpGray(2, 3, (x, y) => 10 * x + y)
    assert(img.length === ImageHeaders.BmpOverhead + 8 * 3)
    def at(i: Int) = img(ImageHeaders.BmpOverhead + i) & 0xff
    // FIRST stored row must be the BOTTOM image row (y = 2):
    // (0,2)=2 then (1,2)=12, each as B,G,R triples, then 2 pad bytes
    assert((at(0), at(1), at(2)) === ((2, 2, 2)))
    assert((at(3), at(4), at(5)) === ((12, 12, 12)))
    // middle row (y = 1) at offset 8, top row (y = 0) at offset 16
    assert(at(8) === 1 && at(11) === 11)
    assert(at(16) === 0 && at(19) === 10)
  }

  test("bmpGray → decodeBmpPixels round-trips every pixel, top-down") {
    for ((w, h) <- Seq((1, 1), (2, 3), (7, 5), (128, 17))) {
      def lum(x: Int, y: Int) = (3 * x + 31 * y) % 256
      val (dw, dh, px) = ImageHeaders.decodeBmpPixels(
        ImageHeaders.bmpGray(w, h, lum))
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(x, y) === lum(x, y), s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("decodeBmpPixels honors a non-standard data offset from the header") {
    // splice 4 junk bytes between header and pixels, patch dataOffset
    val img = ImageHeaders.bmpGray(2, 2, (x, y) => 100 + 2 * x + y)
    val spliced = img.take(ImageHeaders.BmpOverhead) ++
      Array[Byte](9, 9, 9, 9) ++ img.drop(ImageHeaders.BmpOverhead)
    val off = ImageHeaders.BmpOverhead + 4
    spliced(10) = (off & 0xff).toByte
    val (_, _, px) = ImageHeaders.decodeBmpPixels(spliced)
    assert(px(0, 0) === 100 && px(1, 0) === 102 &&
      px(0, 1) === 101 && px(1, 1) === 103)
  }

  test("junk bytes decode as unknown") {
    assert(ImageHeaders.decodeHeader("not an image at all, sorry".getBytes)
      === (("unknown", -1, -1, -1)))
    assert(ImageHeaders.decodeHeader(Array[Byte]()) === (("unknown", -1, -1, -1)))
  }

  test("damaged containers decode as unknown, never throw") {
    // the mm_quarantine contract: structured errors, not task failures
    val png = ImageHeaders.png(40, 30, 8, "payload".getBytes)
    val bmp = ImageHeaders.bmp(40, 30, 24, "payload".getBytes)
    for (img <- Seq(png, bmp)) {
      // truncated below any header size (the fixture's 9-byte damage)
      assert(ImageHeaders.decodeHeader(img.take(9))
        === (("unknown", -1, -1, -1)))
      // magic bytes zeroed but full length intact
      val zeroed = img.clone(); zeroed(0) = 0; zeroed(1) = 0
      assert(ImageHeaders.decodeHeader(zeroed) === (("unknown", -1, -1, -1)))
    }
    // a truncation that keeps the PNG signature but cuts the IHDR short
    // must also be unknown (length guard, not just magic match)
    assert(ImageHeaders.decodeHeader(png.take(20))
      === (("unknown", -1, -1, -1)))
  }
}
