package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time windowed aggregation under Structured Streaming with a
  * watermark (SURVEY §2.9 "streaming windows/watermarks"): late data
  * beyond the watermark is dropped; closed windows emit exactly once in
  * append mode. */
class StreamingWindowSpec extends SparkSuite {

  test("tumbling window + watermark: closed windows emit, late rows drop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = stream.toDS()
      .toDF("event_ts", "event_type", "value")
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")
    try {
      // hour-10 window gets 2 clicks
      stream.addData((ts(10, 5), "click", 1.0), (ts(10, 50), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("win_out").count() == 0) // window not closed yet

      // event at 11:30 advances the watermark to 11:20 → hour-10 closes
      stream.addData((ts(11, 30), "view", 3.0))
      q.processAllAvailable()
      val closed = spark.table("win_out").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[java.sql.Timestamp]("ws") == ts(10, 0))
      assert(closed.head.getAs[Long]("n") == 2)

      // a LATE row for hour 10 (behind the watermark) must not reopen it
      stream.addData((ts(10, 59), "click", 4.0))
      stream.addData((ts(13, 0), "view", 5.0)) // advance further, close hour 11
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("event_type"), r.getAs[Long]("n")))
      assert(rows.count(_._1 == ts(10, 0)) == 1) // still exactly one hour-10 emission
      assert(rows.contains((ts(11, 0), "view", 1L)))
    } finally q.stop()
  }
}
