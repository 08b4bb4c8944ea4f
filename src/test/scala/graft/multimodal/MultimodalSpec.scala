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
}
