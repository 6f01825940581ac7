package graft.functions

/** Pure-JVM WAV-PCM codec — the real decoder that replaced round 1-4's
  * `decodeStub` (the container ships no media libraries, but RIFF/WAVE
  * PCM needs none: a header walk plus little-endian sample extraction).
  *
  * Scope: canonical RIFF/WAVE with a PCM `fmt ` chunk (audioFormat 1,
  * 8 or 16 bits per sample) and one `data` chunk, with unknown chunks
  * (LIST, cue, fact, …) SKIPPED per the RIFF rules — chunk sizes are
  * little-endian u32 and odd-sized chunk bodies are padded to the next
  * even offset. 8-bit PCM is unsigned (centered at 128), 16-bit is
  * signed little-endian; [[decode]] normalizes both to signed Int
  * samples so downstream features (energy, VAD) are format-agnostic.
  *
  * [[encode]] is the test/synthesis twin: it writes the same canonical
  * form and supports planting extra skip-chunks ahead of `data`, so
  * specs can prove the decoder actually walks the chunk list instead of
  * assuming the 44-byte fast path.
  */
object WavPcm {

  /** Decoded PCM payload: interleaved signed samples. */
  final case class Wav(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      samples: Array[Int]) {
    def nSamples: Long = samples.length.toLong
    /** Σ s² — the raw signal-energy feature (16-bit domain ⇒ each term
      * ≤ 2³⁰, so a > 2³³-sample payload would be the first to overflow
      * a Long: not a real WAV). */
    def energy: Long = {
      var e = 0L
      var i = 0
      while (i < samples.length) { val s = samples(i).toLong; e += s * s; i += 1 }
      e
    }
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not a decodable PCM WAV: $msg")

  /** Parse a RIFF/WAVE PCM payload. Fails loudly (IllegalArgumentException)
    * on anything that isn't integer-PCM WAV — a malformed payload must
    * surface as the error channel's problem, never as silent zeros. */
  def decode(bytes: Array[Byte]): Wav = {
    if (bytes.length < 12) fail(s"only ${bytes.length} bytes")
    if (tag(bytes, 0) != "RIFF") fail("missing RIFF magic")
    if (tag(bytes, 8) != "WAVE") fail("missing WAVE form type")
    var off = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var data: (Int, Int) = null // (offset, length)
    while (off + 8 <= bytes.length && (data == null || channels < 0)) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      if (size > bytes.length - off - 8)
        fail(s"chunk $id claims $size bytes past the payload end")
      val body = off + 8
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size)")
          val audioFormat = u16(bytes, body)
          if (audioFormat != 1) fail(s"audioFormat $audioFormat (not PCM)")
          channels = u16(bytes, body + 2)
          sampleRate = u32(bytes, body + 4).toInt
          bits = u16(bytes, body + 14)
          if (bits != 8 && bits != 16) fail(s"$bits bits per sample")
          if (channels < 1) fail(s"$channels channels")
        case "data" => data = (body, size.toInt)
        case _      => () // LIST/cue/fact/…: skip per RIFF rules
      }
      off = body + size.toInt + (size.toInt & 1) // odd chunks pad to even
    }
    if (channels < 0) fail("no fmt chunk")
    if (data == null) fail("no data chunk")
    val (dOff, dLen) = data
    val samples =
      if (bits == 8) {
        val out = new Array[Int](dLen)
        var i = 0
        // 8-bit PCM is unsigned, centered at 128 → signed domain
        while (i < dLen) { out(i) = (bytes(dOff + i) & 0xff) - 128; i += 1 }
        out
      } else {
        val n = dLen / 2 // a trailing odd byte is not a sample
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = bytes(dOff + 2 * i) & 0xff
          val hi = bytes(dOff + 2 * i + 1)
          out(i) = (hi << 8) | lo // sign carried by hi
          i += 1
        }
        out
      }
    Wav(channels, sampleRate, bits, samples)
  }

  /** Write canonical RIFF/WAVE around raw PCM `data` bytes.
    * `skipChunks` plants (id, body) chunks between `fmt ` and `data` —
    * decoders that assume byte 44 is the data start break on these. */
  def encodeRaw(
      data: Array[Byte],
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      skipChunks: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16,
      s"PCM WAV writer supports 8/16 bits, got $bitsPerSample")
    val bb = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def wtag(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    val extras = skipChunks.map { case (id, body) =>
      require(id.length == 4, s"RIFF chunk id must be 4 chars: '$id'")
      (id, body, body.length + (body.length & 1))
    }
    val extraBytes = extras.map(8 + _._3).sum
    val dataPadded = data.length + (data.length & 1)
    val blockAlign = channels * bitsPerSample / 8
    wtag("RIFF"); w32(4 + (8 + 16) + extraBytes + 8L + dataPadded); wtag("WAVE")
    wtag("fmt "); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate.toLong * blockAlign); w16(blockAlign); w16(bitsPerSample)
    for ((id, body, padded) <- extras) {
      wtag(id); w32(body.length)
      bb.write(body)
      if (padded != body.length) bb.write(0)
    }
    wtag("data"); w32(data.length); bb.write(data)
    // RIFF even-boundary rule: an odd-length chunk body carries one pad
    // byte (the size field stays the unpadded length) — reachable with
    // 8-bit mono PCM and an odd sample count
    if ((data.length & 1) == 1) bb.write(0)
    bb.toByteArray
  }

  /** Convenience 16-bit mono writer from signed samples. */
  def encode(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    encodeRaw(data, sampleRate, channels = 1, bitsPerSample = 16)
  }
}
