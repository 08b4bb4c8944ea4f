package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the audio-framing contract around the degenerate inputs a real
  * corpus always contains (zero-byte blobs, blobs shorter than one
  * frame) — the `sequence(0, ceil(0/len)-1)` form DESCENDS for an empty
  * blob and would emit two spurious rows without the guard. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def mediaDf(rows: (Long, String)*) =
    rows.toDF("media_id", "txt")
      .select(col("media_id"), encode(col("txt"), "UTF-8").as("media"))

  test("audioFrames: empty blob emits ZERO rows, not a descending sequence") {
    val out = Multimodal.audioFrames(mediaDf(1L -> "", 2L -> "abcd"), 4)
      .select("media_id", "win", "n_bytes", "energy").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 2L && out.head.getLong(1) == 0L)
  }

  test("audioFrames: tail frame is short; energies are exact byte sums of squares") {
    // 6 bytes at frameLen 4 → frames [abcd][ef]
    val rows = Multimodal.audioFrames(mediaDf(7L -> "abcdef"), 4)
      .orderBy("win").select("win", "n_bytes", "energy").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 4L), (1L, 2L)))
    def e(s: String) = s.map(c => c.toLong * c.toLong).sum
    assert(rows.map(_.getLong(2)).toSeq == Seq(e("abcd"), e("ef")))
  }

  test("audioFrames: blob shorter than one frame still emits its single frame") {
    val rows = Multimodal.audioFrames(mediaDf(9L -> "xy"), 64)
      .select("win", "n_bytes").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 2L)))
  }

  test("bmpResize: exact nearest-neighbor downsample of a real 4x2 BMP") {
    // gray values laid out top-down row-major:
    //   10 20 30 40
    //   50 60 70 80
    // 2x1 target picks pixel centers (0.5,0.5)->(1,1)=60, (1.5,0.5)->(3,1)=80
    val blob = BmpCodec.encode(Array(10, 20, 30, 40, 50, 60, 70, 80), 4)
    val out = Seq((1L, blob)).toDF("media_id", "media")
      .select(Multimodal.bmpResize(col("media"), lit(2), lit(1)).as("r"))
      .select("r.width", "r.height", "r.pixels", "r.error").head
    assert(out.getInt(0) == 2 && out.getInt(1) == 1)
    assert(out.getSeq[Int](2) == Seq(60, 80))
    assert(out.isNullAt(3))
  }

  test("bmpResize: upsample replicates pixels; identity resize is lossless") {
    val px = Array(1, 2, 3, 4) // 2x2
    val blob = BmpCodec.encode(px, 2)
    val df = Seq((1L, blob)).toDF("media_id", "media")
    val up = df.select(Multimodal.bmpResize(col("media"), lit(4), lit(2)).as("r"))
      .select("r.pixels").head.getSeq[Int](0)
    assert(up == Seq(1, 1, 2, 2, 3, 3, 4, 4))
    val id = df.select(Multimodal.bmpResize(col("media"), lit(2), lit(2)).as("r"))
      .select("r.pixels").head.getSeq[Int](0)
    assert(id == px.toSeq)
  }

  test("wavResample: exact nearest-neighbor decimation and stretch") {
    // 8 samples → 4: centers floor((x+0.5)·8/4) pick indices 1,3,5,7;
    // 2 samples → 4: centers floor((x+0.5)·2/4) = 0,0,1,1 (replication)
    val clip8 = WavCodec.encode(Array(10, 20, 30, 40, 50, 60, 70, 80))
    val clip2 = WavCodec.encode(Array(3, 9))
    val out = Seq((1L, clip8), (2L, clip2)).toDF("media_id", "media")
      .select(col("media_id"),
        Multimodal.wavResample(col("media"), lit(4)).as("r"))
      .select(col("media_id"), col("r.samples"), col("r.error"))
      .orderBy("media_id").collect()
    assert(out(0).getSeq[Int](1) == Seq(20, 40, 60, 80))
    assert(out(1).getSeq[Int](1) == Seq(3, 3, 9, 9))
    assert(out(0).isNullAt(2) && out(1).isNullAt(2))
  }

  test("wavResample: torn and empty clips are error rows, not throws") {
    val torn = WavCodec.encode(Array(1, 2, 3)).take(10)
    val empty = WavCodec.encode(Array.empty[Int])
    val out = Seq((1L, torn), (2L, empty)).toDF("media_id", "media")
      .select(col("media_id"),
        Multimodal.wavResample(col("media"), lit(4)).as("r"))
      .select(col("media_id"), col("r.nSamples"), col("r.error"))
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) == 0 && out(0).getString(2) == "short_header")
    assert(out(1).getInt(1) == 0 && out(1).getString(2) == "bad_resample_target")
  }

  test("bmpResize: malformed blobs and bad targets are error rows, not throws") {
    val rows = Seq(
      (1L, "JUNK".getBytes("US-ASCII")),
      (2L, BmpCodec.encode(Array(9), 1)))
      .toDF("media_id", "media")
      .select(col("media_id"),
        Multimodal.bmpResize(col("media"),
          when(col("media_id") === 2L, lit(0)).otherwise(lit(2)), lit(2)).as("r"))
      .select(col("media_id"), col("r.error")).orderBy("media_id").collect()
    assert(rows(0).getString(1) == "short_header") // 4 bytes < the 54-byte header
    assert(rows(1).getString(1) == "bad_resize_target")
  }

  test("bmpResize: a target whose pixel count overflows Int is an error row") {
    // 46341² = 2147488281 wraps Int negative: without the Long guard the
    // UDF would throw NegativeArraySizeException instead of erroring
    val blob = BmpCodec.encode(Array(1, 2, 3, 4), 2)
    val r = Seq((1L, blob)).toDF("media_id", "media")
      .select(Multimodal.bmpResize(col("media"), lit(46341), lit(46341)).as("r"))
      .select("r.error").head
    assert(r.getString(0) == "bad_resize_target")
  }

  test("audioFramesWav: good, torn and zero-sample clips in ONE pass") {
    // 6 samples at frameLen 4 → wins [abcd][ef]-shaped; a torn header →
    // one win=-1 error row; a valid zero-sample clip → zero rows
    val good = WavCodec.encode(Array(3, 4, 5, 6, 7, 8))
    val torn = good.take(10)
    val empty = WavCodec.encode(Array.empty[Int])
    val df = Seq((1L, good), (2L, torn), (3L, empty)).toDF("media_id", "media")
    val out = Multimodal.audioFramesWav(df, 4)
      .orderBy("media_id", "win").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 0L, 4L), (1L, 1L, 2L), (2L, -1L, 0L)))
    assert(out(0).getLong(3) == 9 + 16 + 25 + 36 && out(1).getLong(3) == 49 + 64)
    assert(out(0).isNullAt(4) && out(2).getString(4) == "short_header")
  }

  test("phash: the 2^24 cell clamp keeps huge blobs exact (vs BigInt reference)") {
    // ~68 MB pushes cell sums past 2^24, where unclamped int64 DCT
    // accumulation would wrap silently (and diverge from DuckDB's
    // 128-bit sums); the clamp is the contract — pin it against an
    // overflow-free BigInt reference of the SAME recipe
    // cells are ~69632 bytes here; alternating 64 KiB blocks of 0xff
    // (sum ≈ 17.7M > 2^24 → clamps) and varied bytes (≈ 8.9M → doesn't)
    // give a non-degenerate grid that engages the clamp on some cells
    val L = 68 * 1024 * 1024
    val blob = new Array[Byte](L)
    var i = 0
    while (i < L) {
      blob(i) =
        if (((i >> 16) & 1) == 0) 0xff.toByte
        else ((i * 31 + 7) & 0xff).toByte
      i += 1
    }
    val g = Array.tabulate(1024) { c =>
      var p = (c.toLong * L / 1024).toInt
      val end = ((c + 1).toLong * L / 1024).toInt
      var s = 0L
      while (p < end) { s += blob(p) & 0xffL; p += 1 }
      math.min(s, 1L << 24)
    }
    assert(g.exists(_ == (1L << 24)), "fixture must actually engage the clamp")
    val T = Multimodal.DctT
    val r = Array.tabulate(32, 8) { (x, v) =>
      (0 until 32).map(y => BigInt(g(x * 32 + y)) * T(v * 32 + y)).sum
    }
    val coef = Array.tabulate(64) { j =>
      (0 until 32).map(x => BigInt(T((j / 8) * 32 + x)) * r(x)(j % 8)).sum
    }
    val ac = coef.drop(1)
    val med = ac.sorted.apply(31)
    val expected = ac.zipWithIndex
      .collect { case (a, k) if a > med => 1L << k }.sum
    assert(Multimodal.phashBytes(blob) == expected)
  }
}
