package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The WAV container contract: round-trip, chunk walking, and the
  * row-level error strings q73 surfaces (PhyParser.py:10-12 semantics —
  * malformed input is data, not an exception). */
class WavCodecSpec extends AnyFunSuite {
  import WavCodec._

  private val samples = Array(0, 1, 127, 255, 32767, -32768, -1, 42)

  test("encode→decode round-trips samples, rate, and mono layout") {
    val d = decode(encode(samples, sampleRate = 44100))
    assert(d.error == null)
    assert(d.sampleRate == 44100 && d.channels == 1)
    assert(d.nSamples == samples.length)
    assert(d.samples.toSeq == samples.toSeq) // incl. int16 sign extension
  }

  test("unknown chunks before data are skipped; odd sizes carry a pad byte") {
    val base = encode(samples)
    // splice a 5-byte LIST chunk (odd → 1 pad byte) between fmt and data
    val junk = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    // RIFF size field is now stale, but chunk walking doesn't use it
    val d = decode(spliced)
    assert(d.error == null && d.samples.toSeq == samples.toSeq)
  }

  test("each malformed shape yields its error string, never a throw") {
    val good = encode(samples)
    assert(decode(null).error == "short_header")
    assert(decode(good.slice(0, 10)).error == "short_header")
    assert(decode("JUNK".getBytes ++ good.drop(4)).error == "not_riff")
    // data chunk before any fmt chunk
    val noFmt = good.slice(0, 12) ++ good.slice(36, good.length)
    assert(decode(noFmt).error == "no_fmt")
    // PCM codec id swapped for 3 (IEEE float)
    val float = good.clone(); float(20) = 3
    assert(decode(float).error == "not_pcm16")
    // declared data length runs past the blob
    assert(decode(good.slice(0, good.length - 2)).error == "truncated_data")
    // header + fmt only, no data chunk at all
    assert(decode(good.slice(0, 36)).error == "no_data")
  }

  test("zero-sample clip decodes clean with an empty sample array") {
    val d = decode(encode(Array.empty[Int]))
    assert(d.error == null && d.nSamples == 0 && d.samples.isEmpty)
  }

  test("a chunk size near 2^31 errors instead of wrapping the bounds check") {
    // body + sz would wrap negative in int math, bypassing truncation
    // and crashing on allocation — the never-throws contract's edge
    val good = encode(samples)
    val evil = good.clone()
    val szOff = 40 // data chunk size field
    evil(szOff) = 0xf0.toByte; evil(szOff + 1) = 0xff.toByte
    evil(szOff + 2) = 0xff.toByte; evil(szOff + 3) = 0x7f.toByte // 0x7ffffff0
    assert(decode(evil).error == "truncated_data")
  }
}
