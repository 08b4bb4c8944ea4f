package graft.streaming

import graft.SparkSuite
import graft.multimodal.{Multimodal, Y4mCodec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The media decode path under Structured Streaming: clips arrive as
  * binary Y4M blobs on a stream, the REAL container parser runs
  * per-row inside the micro-batch (same y4mDecode column as batch q41),
  * and per-frame luma features aggregate under a watermark — the
  * streaming twin of the q41 batch path, proving the parser column is
  * streaming-safe (deterministic, no state, error rows flow as data). */
class MediaStreamSpec extends SparkSuite {

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")

  test("Y4M clips decode in-stream; luma totals and error rows match batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val clips = Seq(
      (ts(0), 1L, Y4mCodec.encode((1 to 20).toArray)),       // 3 frames
      (ts(1), 2L, Y4mCodec.encode(Array.empty[Int])),        // 0 frames
      (ts(2), 3L, "JUNKMAGIC W4 H2\nrest".getBytes("US-ASCII")), // not_y4m
      (ts(3), 4L, Y4mCodec.encode(Array.fill(8)(10))))       // 1 frame

    def features(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("dec", Multimodal.y4mDecode(col("media")))
      .select(col("ts"), col("media_id"),
        col("dec.nFrames").as("n_frames"),
        aggregate(col("dec.lumaSums"), lit(0L), (a, x) => a + x).as("luma_total"),
        col("dec.error").as("error"))

    val stream = MemoryStream[(java.sql.Timestamp, Long, Array[Byte])]
    val q = features(stream.toDS().toDF("ts", "media_id", "media"))
      .withWatermark("ts", "10 minutes")
      .writeStream.format("memory").queryName("media_stream")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(clips.take(2): _*)
      q.processAllAvailable()
      stream.addData(clips.drop(2): _*)
      q.processAllAvailable()

      val streamed = spark.table("media_stream")
        .collect().map(r => (r.getLong(1), r.getInt(2),
          if (r.isNullAt(3)) null else r.getLong(3), r.getString(4))).toSet
      val batch = features(clips.toDF("ts", "media_id", "media"))
        .collect().map(r => (r.getLong(1), r.getInt(2),
          if (r.isNullAt(3)) null else r.getLong(3), r.getString(4))).toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")

      val byId = streamed.map(t => t._1 -> t).toMap
      assert(byId(1L)._2 == 3 && byId(1L)._3 == (1 to 20).map(_.toLong).sum)
      assert(byId(2L)._2 == 0 && byId(2L)._3 == 0L)
      assert(byId(3L)._4 == "not_y4m") // decode failure is row data in-stream
      assert(byId(4L)._2 == 1 && byId(4L)._3 == 80L)
    } finally q.stop()
  }
}
