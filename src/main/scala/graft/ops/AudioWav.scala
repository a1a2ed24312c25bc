package graft.ops

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM WAV (RIFF/PCM) codec for the multimodal audio path — the
  * audio sibling of [[ImageHeaders]]: a real (if minimal) encoder plus
  * a CHUNK-WALKING decoder, so the decode step runs genuine container
  * parsing instead of assuming the encoder's layout.
  *
  * RIFF layout: "RIFF" + riffSize(LE32) + "WAVE", then a chunk list.
  * Each chunk is id(4 ASCII) + size(LE32) + payload (+ 1 pad byte when
  * size is odd — RIFF word alignment). The "fmt " chunk (16 bytes for
  * PCM) carries audioFormat=1, channels, sampleRate(LE32),
  * byteRate, blockAlign, bitsPerSample(LE16); the "data" chunk carries
  * the samples — here mono signed PCM16, little-endian. The decoder
  * walks the chunk list (skipping unknown chunks like LIST/INFO, as a
  * real reader must) rather than reading fixed offsets.
  */
object AudioWav {

  /** header bytes an encoded mono PCM16 stream adds around the
    * samples: 12 RIFF header + 24 fmt chunk + 8 data chunk header
    */
  val WavOverhead: Int = 12 + 24 + 8

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode mono signed-PCM16 samples at `sampleRate` as a complete
    * WAV stream.
    */
  def wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val fmt = "fmt ".getBytes(US_ASCII) ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(sampleRate) ++
      le32(sampleRate * 2) ++ le16(2) ++ le16(16)
    val data = "data".getBytes(US_ASCII) ++ le32(dataSize) ++
      samples.flatMap(s => le16(s & 0xffff))
    val riffSize = 4 + fmt.length + data.length
    "RIFF".getBytes(US_ASCII) ++ le32(riffSize) ++
      "WAVE".getBytes(US_ASCII) ++ fmt ++ data
  }

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, US_ASCII)

  /** Decoded mono PCM16 stream: format fields from the fmt chunk, the
    * sample count from the data chunk's size, and an index accessor
    * returning the signed sample value.
    */
  final case class Pcm(sampleRate: Int, bitsPerSample: Int,
      nSamples: Int, sample: Int => Int)

  /** Decode by WALKING the RIFF chunk list — unknown chunks (LIST,
    * INFO, cue …) are skipped over their declared (word-aligned) size,
    * exactly as a real reader must. Throws on a non-RIFF/WAVE stream
    * or when fmt/data are missing.
    */
  def decode(b: Array[Byte]): Pcm = {
    require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE stream")
    var off = 12
    var sampleRate = -1
    var bits = -1
    var blockAlign = -1
    var dataOff = -1
    var dataSize = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val size = readLe32(b, off + 4)
      if (id == "fmt ") {
        require(readLe16(b, off + 8) == 1, "only PCM (format 1) supported")
        sampleRate = readLe32(b, off + 12)
        blockAlign = readLe16(b, off + 20)
        bits = readLe16(b, off + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataSize = size
      }
      off += 8 + size + (size & 1) // odd chunks carry a pad byte
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 16 && blockAlign == 2, "only mono PCM16 supported")
    val n = dataSize / 2
    Pcm(sampleRate, bits, n,
      i => (readLe16(b, dataOff + 2 * i) << 16) >> 16) // sign-extend
  }
}
