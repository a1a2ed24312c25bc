package graft.ops

import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.CRC32

/** Pure-JVM image-container codec for the multimodal decode path: a
  * real (if minimal) PNG and BMP writer plus a fixed-offset header
  * decoder — no codec libraries needed, so the decode step is genuinely
  * executable in this container instead of stubbed.
  *
  * PNG layout (the spec's fixed offsets): 8-byte signature, then the
  * IHDR chunk — length(4,BE) type(4) width(4,BE at offset 16)
  * height(4,BE at 20) bitDepth(1 at 24) colorType compression filter
  * interlace, CRC32(4) over type+data. The payload body rides in a
  * tEXt chunk (keyword "doc" + NUL + bytes) and the stream closes with
  * IEND — chunk-structurally valid, just not renderable (no IDAT).
  *
  * BMP layout: "BM" + fileSize(LE) + reserved + dataOffset (14 bytes),
  * then BITMAPINFOHEADER: size=40, width(LE32 at offset 18),
  * height(LE32 at 22), planes(1), bitsPerPixel(LE16 at 28); body
  * appended after the 54-byte header.
  */
object ImageHeaders {

  /** total bytes a png() payload adds around the body: 8 signature +
    * 25 IHDR + (8 + 4 + body + 4) tEXt + 12 IEND
    */
  val PngOverhead: Int = 8 + 25 + 16 + 12

  /** total bytes a bmp() payload adds around the body: 14 file header +
    * 40 info header
    */
  val BmpOverhead: Int = 54

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val t = ctype.getBytes(US_ASCII)
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  def png(width: Int, height: Int, bitDepth: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = chunk("IHDR",
      be32(width) ++ be32(height) ++
        Array(bitDepth.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte))
    val text = chunk("tEXt", "doc".getBytes(US_ASCII) ++ Array(0.toByte) ++ body)
    sig ++ ihdr ++ text ++ chunk("IEND", Array.emptyByteArray)
  }

  def bmp(width: Int, height: Int, bitsPerPixel: Int, body: Array[Byte]): Array[Byte] = {
    val fileSize = BmpOverhead + body.length
    val fileHeader = "BM".getBytes(US_ASCII) ++ le32(fileSize) ++
      le32(0) ++ le32(BmpOverhead)
    val infoHeader = le32(40) ++ le32(width) ++ le32(height) ++
      le16(1) ++ le16(bitsPerPixel) ++ Array.fill(24)(0.toByte)
    fileHeader ++ infoHeader ++ body
  }

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode a renderable 24-bpp grayscale BMP. `pixel(x, y)` is the
    * 0-255 luminance at TOP-DOWN coordinates; the encoder writes the
    * on-disk layout any BMP reader expects — rows stored BOTTOM-UP,
    * each row padded to a 4-byte boundary, each pixel as
    * (B,G,R) = (v,v,v).
    */
  def bmpGray(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) & ~3
    val body = new Array[Byte](rowSize * height)
    var y = 0
    while (y < height) {
      val rowOff = (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val v = (pixel(x, y) & 0xff).toByte
        val o = rowOff + x * 3
        body(o) = v; body(o + 1) = v; body(o + 2) = v
        x += 1
      }
      y += 1
    }
    bmp(width, height, 24, body)
  }

  /** Decode a 24-bpp BMP into (width, height, pixel accessor at
    * TOP-DOWN coordinates, blue channel). Reads the pixel-data offset
    * from the file header — never assumes the encoder's 54 — and
    * undoes both the bottom-up row order and the 4-byte row padding.
    */
  def decodeBmpPixels(b: Array[Byte]): (Int, Int, (Int, Int) => Int) = {
    require(b.length >= BmpOverhead && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
      "not a BMP stream")
    require(readLe16(b, 28) == 24, "only 24-bpp BMPs are supported")
    val dataOff = readLe32(b, 10)
    val w = readLe32(b, 18)
    val h = readLe32(b, 22)
    val rowSize = (w * 3 + 3) & ~3
    (w, h, (x, y) => b(dataOff + (h - 1 - y) * rowSize + x * 3) & 0xff)
  }

  /** Decode (format, width, height, bitDepth) from the container header
    * at its fixed offsets; ("unknown", -1, -1, -1) when neither magic
    * matches.
    */
  def decodeHeader(b: Array[Byte]): (String, Int, Int, Int) =
    if (b.length >= 25 && b.startsWith(PngSig))
      ("png", readBe32(b, 16), readBe32(b, 20), b(24) & 0xff)
    else if (b.length >= 30 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
      ("bmp", readLe32(b, 18), readLe32(b, 22), readLe16(b, 28))
    else ("unknown", -1, -1, -1)
}
