package graft

import graft.functions.WavPcm
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM WAV-PCM codec that replaced the decode stub: crafted
  * fixture bytes, roundtrips, chunk walking, both sample widths, and
  * loud failure on non-WAV payloads. */
class WavPcmSpec extends AnyFunSuite {

  test("16-bit roundtrip: encode then decode returns the exact samples") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = WavPcm.decode(WavPcm.encode(samples, sampleRate = 8000))
    assert(wav.channels == 1 && wav.sampleRate == 8000 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.map(_.toInt).toSeq)
    assert(wav.energy == samples.map(s => s.toLong * s).sum)
  }

  test("hand-built 44-byte fixture decodes field by field") {
    // canonical header + two samples: 0x0201 = 513, 0xFFFF = -1
    val bytes = Array[Int](
      'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // PCM
      1, 0, // mono
      0x40, 0x1f, 0, 0, // 8000 Hz
      0x80, 0x3e, 0, 0, // byte rate
      2, 0, // block align
      16, 0, // bits
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      0x01, 0x02, 0xff, 0xff).map(_.toByte)
    val wav = WavPcm.decode(bytes)
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == Seq(513, -1))
  }

  test("decoder walks unknown chunks (incl. odd-size padding) instead of assuming byte 44") {
    val data = Array[Byte](10, 0, -10, -1) // samples 10, -10 (0xFFF6 LE)
    val withJunk = WavPcm.encodeRaw(data, 16000, 1, 16,
      skipChunks = Seq("LIST" -> Array[Byte](1, 2, 3), // odd → padded
        "cue " -> Array[Byte](9, 9)))
    val wav = WavPcm.decode(withJunk)
    assert(wav.samples.toSeq == Seq(10, -10))
  }

  test("8-bit PCM is unsigned, centered at 128") {
    val data = Array[Byte](0, 127.toByte, 128.toByte, 255.toByte)
    val wav = WavPcm.decode(WavPcm.encodeRaw(data, 44100, 1, 8))
    assert(wav.bitsPerSample == 8)
    assert(wav.samples.toSeq == Seq(-128, -1, 0, 127))
  }

  test("non-WAV payloads fail loudly, never decode to silence") {
    val cases = Seq(
      "plain text, definitely not RIFF".getBytes("UTF-8"),
      Array[Byte](1, 2, 3), // too short
      WavPcm.encode(Array[Short](1, 2)).patch(8, "XXXX".getBytes, 4), // bad form type
      { // claims a chunk bigger than the payload
        val ok = WavPcm.encode(Array[Short](1, 2))
        ok.patch(40, Array[Byte](-1, -1, -1, 0x7f), 4)
      })
    for (bad <- cases)
      assertThrows[IllegalArgumentException](WavPcm.decode(bad))
  }

  test("float/compressed formats are rejected (PCM only)") {
    val pcm = WavPcm.encode(Array[Short](1))
    val ieeeFloat = pcm.patch(20, Array[Byte](3, 0), 2) // audioFormat = 3
    assertThrows[IllegalArgumentException](WavPcm.decode(ieeeFloat))
  }

  test("a trailing odd data byte is not a sample (16-bit)") {
    val wav = WavPcm.decode(WavPcm.encodeRaw(Array[Byte](1, 0, 99), 16000, 1, 16))
    assert(wav.samples.toSeq == Seq(1))
  }

  test("odd-length 8-bit data chunk is pad-byte aligned per the RIFF rule") {
    val data = Array[Byte](0, 255.toByte, 128.toByte) // 3 samples, odd body
    val bytes = WavPcm.encodeRaw(data, 8000, 1, 8)
    // total file length is even and the RIFF size field covers the pad
    assert(bytes.length % 2 == 0)
    val riffSize = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8) |
      ((bytes(6) & 0xff) << 16) | ((bytes(7) & 0xff) << 24)
    assert(riffSize == bytes.length - 8)
    // the data size field stays the unpadded length and decode ignores the pad
    val wav = WavPcm.decode(bytes)
    assert(wav.samples.toSeq == Seq(-128, 127, 0))
  }
}
