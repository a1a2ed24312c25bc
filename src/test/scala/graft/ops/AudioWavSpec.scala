package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contract of the pure-JVM WAV codec backing
  * mm_audio_stats — pins the RIFF layout, little-endian fields, PCM16
  * sign extension, and the decoder's chunk walk.
  */
class AudioWavSpec extends AnyFunSuite {

  test("encoder writes the exact RIFF byte layout") {
    val bytes = AudioWav.wav(8000, Array[Short](1, -2))
    assert(bytes.length === AudioWav.WavOverhead + 4)
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    assert(new String(bytes, 12, 4, "US-ASCII") === "fmt ")
    // fmt size 16, PCM format 1, mono
    assert((bytes(16) & 0xff) === 16 && (bytes(20) & 0xff) === 1 &&
      (bytes(22) & 0xff) === 1)
    // sampleRate 8000 = 0x1F40 little-endian at offset 24
    assert((bytes(24) & 0xff) === 0x40 && (bytes(25) & 0xff) === 0x1f)
    assert(new String(bytes, 36, 4, "US-ASCII") === "data")
    // data size 4, then samples 1 and -2 as LE16 two's complement
    assert((bytes(40) & 0xff) === 4)
    assert((bytes(44) & 0xff, bytes(45) & 0xff) === ((1, 0)))
    assert((bytes(46) & 0xff, bytes(47) & 0xff) === ((0xfe, 0xff)))
  }

  test("decode round-trips samples with sign extension") {
    val samples = Array[Short](0, 32767, -32768, -1, 123, -456)
    val pcm = AudioWav.decode(AudioWav.wav(44100, samples))
    assert(pcm.sampleRate === 44100 && pcm.bitsPerSample === 16)
    assert(pcm.nSamples === samples.length)
    for (i <- samples.indices) assert(pcm.sample(i) === samples(i).toInt)
  }

  test("decoder walks past unknown chunks, including odd-size padding") {
    val base = AudioWav.wav(16000, Array[Short](7, -7, 7))
    // splice an ODD-size junk chunk (size 5 ⇒ 1 pad byte) before fmt
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) ++
      Array[Byte](0) // pad to word boundary
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    val pcm = AudioWav.decode(spliced)
    assert(pcm.sampleRate === 16000 && pcm.nSamples === 3)
    assert((pcm.sample(0), pcm.sample(1), pcm.sample(2)) === ((7, -7, 7)))
  }

  test("non-WAV streams and missing chunks are rejected") {
    intercept[IllegalArgumentException](AudioWav.decode("nope".getBytes))
    intercept[IllegalArgumentException](AudioWav.decode(
      "RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "WAVE".getBytes))
  }
}
