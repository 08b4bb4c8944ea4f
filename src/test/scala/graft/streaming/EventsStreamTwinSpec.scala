package graft.streaming

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** The round-6 recovery, proven under the STREAMING path: q13's
  * tumbling event-time window runs as a real `readStream` over the
  * DSv2 message-log source with the driver's ACTUAL micros-encoded
  * events table, and the append-mode output equals the batch
  * q13TumblingWindow result on the same sfDir. This is the missing
  * half of the ts_us contract: SchemaDriftSpec proves the loader
  * normalizes both encodings in batch; this proves the normalized
  * micros survive serialize → transport log → micro-batch →
  * watermark → window without drift (timestamp_micros on both sides).
  */
class EventsStreamTwinSpec extends SparkSuite {

  private val fmt = "graft.sources.MessageLogSource"
  private val sf = "/root/testdata/sf0.001"

  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts_us", LongType)))

  /** q13's aggregation shape (Streams.scala:24) minus the final sort —
    * identical expressions so the twin test pins the real query. */
  private def q13Shape(parsed: DataFrame): DataFrame = parsed
    .withColumn("event_ts", timestamp_micros(col("ts_us")))
    .withWatermark("event_ts", "1 minute")
    .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
    .agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    .select(col("window.start").as("window_start"), col("event_type"),
      col("n"), col("total_value"))

  test("q13 as readStream over the message log equals batch on real micros testdata") {
    val dir = Files.createTempDirectory("events_twin").toString

    // Render the transport log from the REAL events table: the loader's
    // canonical ts_us becomes both the payload event time and the
    // envelope arrival_ts, exactly what a collector daemon would write.
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val events = graft.Tables.events(spark, sf)
      .select(to_json(struct(col("event_id"), col("user_id"),
        col("event_type"), col("value"), col("ts_us"))).as("msg"),
        col("ts_us"), col("event_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .collect()
    assert(events.length > 100, s"unexpectedly small events table: ${events.length}")

    def jsonl(rows: Seq[(String, Long)], startSeq: Long): Seq[String] =
      rows.zipWithIndex.map { case ((msg, tsUs), i) =>
        s"""{"topic":"events/replay","message":${mapper.writeValueAsString(msg)},""" +
          s""""data_collector_id":1,"organization_id":1,"seq":${startSeq + i},"arrival_ts":$tsUs}"""
      }
    val (first, second) = events.map(r => (r.getString(0), r.getLong(1)))
      .toSeq.splitAt(events.length / 2)
    // sentinel a day past the last event: advances the watermark so every
    // real window closes and emits; its own window stays open and never does
    val sentinelTs = events.last.getLong(1) + 86400L * 1000000L
    val sentinel =
      s"""{"event_id":-1,"user_id":-1,"event_type":"__sentinel__","value":0.0,"ts_us":$sentinelTs}"""

    Files.write(Paths.get(dir, "000001.jsonl"),
      jsonl(first, 0).mkString("\n").getBytes("UTF-8"))

    val parsed = spark.readStream.format(fmt).load(dir)
      .select(from_json(col("message"), payloadSchema).as("e"))
      .select(col("e.*"))
    val q = q13Shape(parsed)
      .writeStream.format("memory").queryName("events_twin")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      Files.write(Paths.get(dir, "000002.jsonl"),
        (jsonl(second, first.length.toLong) :+
          (s"""{"topic":"events/replay","message":${mapper.writeValueAsString(sentinel)},""" +
            s""""data_collector_id":1,"organization_id":1,"seq":${events.length},"arrival_ts":$sentinelTs}"""))
          .mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()

      def key(df: DataFrame) = df.collect().map { r =>
        (r.getAs[java.sql.Timestamp]("window_start").getTime,
          r.getString(1), r.getLong(2), r.getDouble(3))
      }.toSet
      val streamed = key(spark.table("events_twin"))
      val batch = key(graft.queries.Streams.q13TumblingWindow(spark, sf))
      assert(streamed == batch,
        s"stream-batch drift: onlyStream=${streamed.diff(batch).take(3)} " +
          s"onlyBatch=${batch.diff(streamed).take(3)}")
      assert(streamed.nonEmpty)
      assert(!streamed.exists(_._2 == "__sentinel__")) // open window never emitted
    } finally q.stop()
  }
}
