package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The BMP container contract: round-trip through real header + stride
  * + bottom-up storage, and the row-level error strings (PhyParser.py:
  * 10-12 semantics — malformed input is data, not an exception). */
class BmpCodecSpec extends AnyFunSuite {
  import BmpCodec._

  test("encode→decode round-trips gray pixels in top-down order") {
    // width 3 → 9 pixel bytes/row, stride pads to 12; 2 rows exercise
    // the bottom-up storage flip
    val gray = Array(10, 20, 30, 40, 50, 60)
    val d = decode(encode(gray, width = 3))
    assert(d.error == null)
    assert(d.width == 3 && d.height == 2 && d.channels == 3)
    assert(d.pixels.toSeq == gray.toSeq)
  }

  test("single-row fixture shape: width = byte count, height = 1") {
    val bytes = "hello".getBytes("UTF-8").map(b => b & 0xff)
    val d = decode(encode(bytes, width = bytes.length))
    assert(d.error == null && d.width == 5 && d.height == 1)
    assert(d.pixels.toSeq == bytes.toSeq)
  }

  test("top-down (negative height) BMPs decode to the same pixel order") {
    val gray = Array(1, 2, 3, 4, 5, 6)
    val b = encode(gray, width = 3)
    // flip to top-down: negate height, swap the two stored rows
    val st = 12
    val flipped = b.clone()
    val neg = -2
    flipped(22) = (neg & 0xff).toByte; flipped(23) = ((neg >> 8) & 0xff).toByte
    flipped(24) = ((neg >> 16) & 0xff).toByte; flipped(25) = ((neg >> 24) & 0xff).toByte
    Array.copy(b, 54, flipped, 54 + st, st)
    Array.copy(b, 54 + st, flipped, 54, st)
    val d = decode(flipped)
    assert(d.error == null && d.pixels.toSeq == gray.toSeq)
  }

  test("each malformed shape yields its error string, never a throw") {
    val good = encode(Array(1, 2, 3, 4), width = 4)
    assert(decode(null).error == "short_header")
    assert(decode(good.slice(0, 20)).error == "short_header")
    assert(decode("XX".getBytes ++ good.drop(2)).error == "not_bmp")
    val eightBit = good.clone(); eightBit(28) = 8
    assert(decode(eightBit).error == "unsupported_bmp")
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(decode(rle).error == "unsupported_bmp")
    assert(decode(good.slice(0, good.length - 4)).error == "truncated_pixels")
  }

  test("zero-pixel blob decodes clean with an empty pixel array") {
    val d = decode(encode(Array.empty[Int], width = 0))
    assert(d.error == null && d.width == 0 && d.height == 0 && d.pixels.isEmpty)
  }

  test("overflow geometries error instead of wrapping past the bounds check") {
    def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    val good = encode(Array(1, 2, 3, 4), width = 4)
    // width 1431655766: 3*w wraps to 2 in int math, stride looks tiny
    val wideW = good.clone(); put32(wideW, 18, 1431655766)
    assert(decode(wideW).error == "truncated_pixels")
    // height Int.MinValue survives math.abs negative
    val minH = good.clone(); put32(minH, 22, Int.MinValue)
    assert(decode(minH).error == "unsupported_bmp")
    // w AND h both huge: h·stride ≈ 1.4e19 overflows even LONG math, so a
    // product-form bounds check wraps negative and passes — the guard
    // must compare by division
    val wh = good.clone(); put32(wh, 18, Int.MaxValue); put32(wh, 22, 2000000000)
    assert(decode(wh).error == "truncated_pixels")
  }
}
