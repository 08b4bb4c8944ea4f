package graft.multimodal

/** Pure-JVM Y4M (YUV4MPEG2, 4:2:0) container codec — the VIDEO leg of
  * the multimodal decode swap-in point, next to [[WavCodec]] (audio) and
  * [[BmpCodec]] (image). Y4M is the one real video container with no
  * entropy coding: an ASCII parameter header, then `FRAME\n` markers
  * each followed by raw planar YUV — so a frame-accurate parse needs no
  * native codec.
  *
  * Same row-level error contract as the other two (PhyParser.py:10-12):
  * malformed input yields an error string next to null data, never an
  * exception.
  *
  * Parser shape: the `YUV4MPEG2` magic line carries space-separated
  * `W<int> H<int> F<rate> C<subsampling>` tokens (C absent defaults to
  * 420); each frame is `FRAME[ params]\n` + w·h luma bytes +
  * 2·(w/2)·(h/2) chroma bytes. The decoder walks every frame, summing
  * the luma plane per frame (the per-frame feature q41 consumes);
  * chroma is length-validated and skipped. */
object Y4mCodec {

  final case class Y4mDecoded(
      width: Int,
      height: Int,
      nFrames: Int,
      lumaSums: Array[Long],
      error: String)

  private def err(e: String) = Y4mDecoded(0, 0, 0, null, e)

  private val Magic = "YUV4MPEG2"

  /** Parse a Y4M blob. Never throws: malformed input yields an error row
    * (`short_header` / `not_y4m` / `unsupported_y4m` /
    * `bad_frame_marker` / `truncated_frame`). */
  def decode(blob: Array[Byte]): Y4mDecoded = {
    if (blob == null || blob.length < Magic.length + 1) return err("short_header")
    var nl = -1
    var i = 0
    val headEnd = math.min(blob.length, 256)
    while (nl < 0 && i < headEnd) {
      if (blob(i) == '\n') nl = i
      i += 1
    }
    if (nl < 0) return err("short_header")
    val head = new String(blob, 0, nl, java.nio.charset.StandardCharsets.US_ASCII)
    val toks = head.split(" ")
    if (toks.head != Magic) return err("not_y4m")
    var w = -1
    var h = -1
    var chroma = "420"
    toks.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = t.drop(1).toIntOption.getOrElse(-1)
        case 'C' => chroma = t.drop(1)
        case _ => () // F (rate), I (interlace), A (aspect), X (extension)
      }
    }
    // exact 8-bit 4:2:0 names only: a startsWith("420") prefix test would
    // also admit C420p10/C420p12, whose 2-byte samples make the 8-bit
    // frame geometry below wrong (mid-plane bad_frame_marker on a valid
    // file, or silently interleaved low/high bytes in the luma sums)
    val chroma420 = chroma == "420" || chroma == "420jpeg" ||
      chroma == "420mpeg2" || chroma == "420paldv"
    if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0 || !chroma420)
      return err("unsupported_y4m")
    // Long geometry: W65536 H65536 wraps w*h to 0 and frameLen negative,
    // which would pass the truncation check and walk `off` backwards
    // into a StringIndexOutOfBounds — never-throws needs overflow-proof
    // frame math (the loop below compares in Long and only narrows
    // after the bounds check has capped the values by blob.length)
    val lumaLenL = w.toLong * h
    val frameLenL = lumaLenL + 2L * (w / 2) * (h / 2)
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    var off = nl + 1
    while (off < blob.length) {
      // FRAME marker + optional parameters up to the newline
      if (off + 5 > blob.length ||
        new String(blob, off, 5, java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
        return err("bad_frame_marker")
      var fnl = -1
      var j = off + 5
      val scanEnd = math.min(blob.length, off + 256)
      while (fnl < 0 && j < scanEnd) {
        if (blob(j) == '\n') fnl = j
        j += 1
      }
      if (fnl < 0) return err("bad_frame_marker")
      val body = fnl + 1
      if (body.toLong + frameLenL > blob.length) return err("truncated_frame")
      // bounds check passed → both fit int
      val lumaLen = lumaLenL.toInt
      val frameLen = frameLenL.toInt
      var s = 0L
      var p = 0
      while (p < lumaLen) { s += blob(body + p) & 0xffL; p += 1 }
      sums += s
      off = body + frameLen
    }
    Y4mDecoded(w, h, sums.length, sums.toArray, null)
  }

  /** Encode gray bytes as 4:2:0 frames of `width`×`height` luma (values
    * are the luma plane in order, zero-padded into the last frame;
    * chroma planes filled with neutral 128). Fixture-side inverse of
    * [[decode]] — each frame's luma sum is the sum of its slice of
    * `gray`, which is what keeps q41 oracle-mirrorable. */
  def encode(gray: Array[Int], width: Int = 4, height: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0)
    val lumaLen = width * height
    val chromaLen = 2 * (width / 2) * (height / 2)
    val n = (gray.length + lumaLen - 1) / lumaLen // 0 frames for empty input
    val head = s"$Magic W$width H$height F25:1 Ip A1:1 C420\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + n * (marker.length + lumaLen + chromaLen))
    Array.copy(head, 0, out, 0, head.length)
    var off = head.length
    var f = 0
    while (f < n) {
      Array.copy(marker, 0, out, off, marker.length)
      off += marker.length
      var p = 0
      while (p < lumaLen) {
        val src = f * lumaLen + p
        out(off + p) = if (src < gray.length) (gray(src) & 0xff).toByte else 0
        p += 1
      }
      off += lumaLen
      java.util.Arrays.fill(out, off, off + chromaLen, 128.toByte)
      off += chromaLen
      f += 1
    }
    out
  }
}
