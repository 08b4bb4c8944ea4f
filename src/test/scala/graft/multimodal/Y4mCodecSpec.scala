package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The Y4M container contract: header parsing, frame walking, per-frame
  * luma sums, and the row-level error strings (PhyParser.py:10-12
  * semantics — malformed input is data, not an exception). */
class Y4mCodecSpec extends AnyFunSuite {
  import Y4mCodec._

  test("encode→decode: frame count, dims, and per-frame luma sums") {
    // 10 bytes at 8 luma/frame → 2 frames, second zero-padded
    val gray = (1 to 10).toArray
    val d = decode(encode(gray))
    assert(d.error == null)
    assert(d.width == 4 && d.height == 2 && d.nFrames == 2)
    assert(d.lumaSums.toSeq == Seq((1 to 8).sum.toLong, 9L + 10L))
  }

  test("frame parameters after the FRAME marker are skipped") {
    val b = encode(Array(1, 2, 3))
    // splice an interlace parameter into the frame marker line
    val s = new String(b.drop(b.indexOf('\n'.toByte) + 1).take(6), "US-ASCII")
    assert(s == "FRAME\n")
    val head = b.take(b.indexOf('\n'.toByte) + 1)
    val rest = b.drop(head.length + 6)
    val spliced = head ++ "FRAME Ip\n".getBytes("US-ASCII") ++ rest
    val d = decode(spliced)
    assert(d.error == null && d.nFrames == 1 && d.lumaSums.head == 6L)
  }

  test("non-default geometry and extra header tokens parse (8x4, Xtags)") {
    // 8×4 → 32 luma + 16 chroma bytes per frame; 40 bytes → 2 frames
    val gray = (1 to 40).toArray
    val b = encode(gray, width = 8, height = 4)
    val d0 = decode(b)
    assert(d0.error == null && d0.width == 8 && d0.height == 4 && d0.nFrames == 2)
    assert(d0.lumaSums.toSeq == Seq((1 to 32).sum.toLong, (33 to 40).sum.toLong))
    // rewrite the header with interlace/aspect/extension tokens in a
    // different order + a C420jpeg variant — all must be tolerated
    val nl = b.indexOf('\n'.toByte)
    val newHead = "YUV4MPEG2 C420jpeg Ip A4:3 XCOLORRANGE=FULL W8 H4 F30:1\n"
      .getBytes("US-ASCII")
    val d1 = decode(newHead ++ b.drop(nl + 1))
    assert(d1.error == null && d1.width == 8 && d1.height == 4)
    assert(d1.lumaSums.toSeq == d0.lumaSums.toSeq)
  }

  test("zero-byte payload is a valid zero-frame stream") {
    val d = decode(encode(Array.empty[Int]))
    assert(d.error == null && d.nFrames == 0 && d.lumaSums.isEmpty)
    assert(d.width == 4 && d.height == 2)
  }

  test("each malformed shape yields its error string, never a throw") {
    val good = encode((1 to 20).toArray)
    assert(decode(null).error == "short_header")
    assert(decode(Array[Byte](1, 2, 3)).error == "short_header")
    assert(decode("MPEG4YUV2 W4 H2\nrest".getBytes).error == "not_y4m")
    assert(decode("YUV4MPEG2 W5 H2 C420\n".getBytes).error == "unsupported_y4m")
    // 10/12-bit 4:2:0 variants carry 2-byte samples — a prefix match on
    // "420" would walk their frames with 8-bit geometry (half the real
    // frame size); they must be rejected, not half-parsed
    assert(decode("YUV4MPEG2 W8 H4 C420p10\nFRAME\n".getBytes).error
      == "unsupported_y4m")
    assert(decode("YUV4MPEG2 W4 H2 C444\n".getBytes).error == "unsupported_y4m")
    assert(decode("YUV4MPEG2 H2 C420\n".getBytes).error == "unsupported_y4m")
    // frame marker corrupted
    val bad = good.clone()
    val f0 = good.indexOf('\n'.toByte) + 1
    bad(f0) = 'X'
    assert(decode(bad).error == "bad_frame_marker")
    // last frame cut short
    assert(decode(good.slice(0, good.length - 3)).error == "truncated_frame")
    // W65536 H65536 wraps frameLen negative in int math — must report
    // truncation, not walk the offset backwards and throw
    val huge = ("YUV4MPEG2 W65536 H65536 C420\n" + "FRAME\n").getBytes
    assert(decode(huge).error == "truncated_frame")
  }
}
