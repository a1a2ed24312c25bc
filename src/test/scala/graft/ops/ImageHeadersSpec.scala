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

  test("junk bytes decode as unknown") {
    assert(ImageHeaders.decodeHeader("not an image at all, sorry".getBytes)
      === (("unknown", -1, -1, -1)))
    assert(ImageHeaders.decodeHeader(Array[Byte]()) === (("unknown", -1, -1, -1)))
  }
}
