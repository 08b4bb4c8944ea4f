package graft.multimodal

/** Pure-JVM WAV (RIFF / PCM16LE) container codec — the REAL media parser
  * behind the multimodal decode swap-in point (Multimodal.scala scaladoc):
  * `binary → (format, samples, error)`, no native deps.
  *
  * Decode failures return an error STRING next to null data instead of
  * throwing — the row-level error contract of the reference's PHY parse
  * (PhyParser.py:10-12 returns `(None, error)` and downstream keeps the
  * row); q26 pins the same convention for packet decode, q73 pins it for
  * media.
  *
  * Parser shape: validate the 12-byte RIFF/WAVE preamble, then walk the
  * chunk list — `fmt ` must arrive before `data`, unknown chunks are
  * skipped, odd-sized chunks carry the RIFF pad byte. Multi-channel PCM
  * decodes to interleaved samples (frame energy then sums channels, the
  * standard mono-mixdown-free energy). Only integer arithmetic, so every
  * decoded sample is oracle-exact.
  */
object WavCodec {

  /** Decoded clip: PCM format fields + interleaved int16 samples, or an
    * error string with null samples (never both). */
  final case class WavDecoded(
      sampleRate: Int,
      channels: Int,
      nSamples: Int,
      samples: Array[Int],
      error: String)

  private def err(e: String) = WavDecoded(0, 0, 0, null, e)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a WAV blob. Never throws: malformed input yields an error
    * row (`short_header` / `not_riff` / `no_fmt` / `not_pcm16` /
    * `truncated_data` / `no_data`). */
  def decode(blob: Array[Byte]): WavDecoded = {
    if (blob == null || blob.length < 12) return err("short_header")
    if (tag(blob, 0) != "RIFF" || tag(blob, 8) != "WAVE") return err("not_riff")
    var off = 12
    var fmtCodec = -1
    var channels = 0
    var rate = 0
    var bits = 0
    while (off + 8 <= blob.length) {
      val id = tag(blob, off)
      val sz = le32(blob, off + 4)
      val body = off + 8
      // Long arithmetic: a crafted sz near 2^31 would wrap `body + sz`
      // negative and sail past this check into an allocation/index crash
      // — the never-throws contract requires overflow-proof bounds
      if (sz < 0 || body.toLong + sz.toLong > blob.length) {
        return if (id == "data") err("truncated_data") else err("short_header")
      }
      id match {
        case "fmt " =>
          if (sz < 16) return err("no_fmt")
          fmtCodec = le16(blob, body)
          channels = le16(blob, body + 2)
          rate = le32(blob, body + 4)
          bits = le16(blob, body + 14)
        case "data" =>
          if (fmtCodec == -1) return err("no_fmt")
          if (fmtCodec != 1 || bits != 16 || channels < 1) return err("not_pcm16")
          if (sz % 2 != 0) return err("truncated_data")
          val n = sz / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            // sign-extended little-endian int16
            out(i) = le16(blob, body + 2 * i).toShort.toInt
            i += 1
          }
          return WavDecoded(rate, channels, n, out, null)
        case _ => () // skip unknown chunk (LIST, cue, bext, ...)
      }
      off = body + sz + (sz & 1) // odd chunks carry a pad byte
    }
    if (fmtCodec == -1) err("no_fmt") else err("no_data")
  }

  /** Encode PCM16 mono samples as a minimal canonical WAV blob
    * (RIFF + fmt + data, 44-byte header). Fixture-side inverse of
    * [[decode]]; round-trip pinned in WavCodecSpec. */
  def encode(samples: Array[Int], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putTag(o: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xffff); put16(o + 2, (v >>> 16) & 0xffff)
    }
    putTag(0, "RIFF"); put32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 2) // byte rate
    put16(32, 2) // block align
    put16(34, 16) // bits per sample
    putTag(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) { put16(44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }
}
