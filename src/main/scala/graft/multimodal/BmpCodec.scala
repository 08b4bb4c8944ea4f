package graft.multimodal

/** Pure-JVM BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed) codec —
  * the still-image twin of [[WavCodec]] at the multimodal decode swap-in
  * point: `binary → (width, height, gray pixels, error)`, no native deps.
  *
  * Same row-level error contract as WavCodec (PhyParser.py:10-12):
  * malformed input yields an error string next to null pixels, never an
  * exception.
  *
  * Parser shape: `BM` magic + 14-byte file header (pixel-data offset at
  * byte 10), BITMAPINFOHEADER (≥40 bytes: int32 width/height, bit count
  * 24, compression BI_RGB only). Pixel rows are 4-byte-aligned
  * (stride = ⌈3w/4⌉·4) and stored bottom-up for positive heights
  * (top-down for negative, per the spec); the decoder emits pixels in
  * top-down row-major order either way. Gray extraction is the integer
  * mean (b+g+r)/3 — exact for the achromatic fixture blobs. */
object BmpCodec {

  final case class BmpDecoded(
      width: Int,
      height: Int,
      channels: Int,
      pixels: Array[Int],
      error: String)

  private def err(e: String) = BmpDecoded(0, 0, 0, null, e)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def stride(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Parse a BMP blob. Never throws: malformed input yields an error
    * row (`short_header` / `not_bmp` / `unsupported_bmp` /
    * `truncated_pixels`). */
  def decode(blob: Array[Byte]): BmpDecoded = {
    if (blob == null || blob.length < 54) return err("short_header")
    if (blob(0) != 'B' || blob(1) != 'M') return err("not_bmp")
    val dataOff = le32(blob, 10)
    val infoSize = le32(blob, 14)
    val w = le32(blob, 18)
    val hRaw = le32(blob, 22)
    val bits = le16(blob, 28)
    val compression = le32(blob, 30)
    // hRaw = Int.MinValue survives math.abs still negative and would
    // skip the h > 0 truncation guard into NegativeArraySizeException —
    // reject it with the other unsupported geometries
    if (infoSize < 40 || bits != 24 || compression != 0 || w < 0 ||
        hRaw == Int.MinValue)
      return err("unsupported_bmp")
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    if (dataOff < 54 || dataOff > blob.length) return err("short_header")
    // stride in Long: 3*w wraps for w >= ~715M and a wrapped small
    // stride would pass the bounds check on a crafted header, then
    // crash on allocation — the never-throws contract needs
    // overflow-proof geometry math
    val stL = ((3L * w + 3L) / 4L) * 4L
    // division, not h*stL: the product overflows Long for w AND h both
    // near 2^31 (h·stL ≈ 1.4e19 > Long.MaxValue), and a wrapped-negative
    // product would pass this guard into NegativeArraySizeException
    if (h > 0 && (stL <= 0 || (blob.length - dataOff).toLong / stL < h.toLong))
      return err("truncated_pixels")
    val st = stL.toInt // h > 0 bounds it by blob.length; h == 0 never reads it
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val ro = dataOff + srcRow * st
      var x = 0
      while (x < w) {
        val p = ro + 3 * x
        // BGR triple → integer-mean gray
        out(y * w + x) =
          ((blob(p) & 0xff) + (blob(p + 1) & 0xff) + (blob(p + 2) & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    BmpDecoded(w, h, 3, out, null)
  }

  /** Encode gray pixels (top-down row-major, values 0-255) as a minimal
    * canonical 24-bit BMP (r = g = b = value, bottom-up storage, 4-byte
    * row alignment). `gray.length` must be a multiple of `width`.
    * Fixture-side inverse of [[decode]]; round-trip pinned in
    * BmpCodecSpec. */
  def encode(gray: Array[Int], width: Int): Array[Byte] = {
    val h = if (width == 0) 0 else gray.length / width
    require(width * h == gray.length, "gray length must be a multiple of width")
    val st = stride(width)
    val dataLen = st * h
    val out = new Array[Byte](54 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xffff); put16(o + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataLen) // file size
    put32(10, 54) // pixel data offset
    put32(14, 40) // BITMAPINFOHEADER
    put32(18, width)
    put32(22, h) // positive → bottom-up
    put16(26, 1) // planes
    put16(28, 24) // bits per pixel
    put32(30, 0) // BI_RGB
    put32(34, dataLen)
    var y = 0
    while (y < h) {
      val ro = 54 + (h - 1 - y) * st // bottom-up
      var x = 0
      while (x < width) {
        val v = (gray(y * width + x) & 0xff).toByte
        val p = ro + 3 * x
        out(p) = v; out(p + 1) = v; out(p + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }
}
