package graft.streaming

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** The round-6 recovery, proven under the STREAMING path: the
  * ts-family queries run as real `readStream`s over the DSv2
  * message-log source with the driver's ACTUAL micros-encoded events
  * table, and the streaming output equals the batch query on the same
  * sfDir. This is the missing half of the ts_us contract:
  * SchemaDriftSpec proves the loader normalizes both encodings in
  * batch; these prove the normalized micros survive serialize →
  * transport log → micro-batch → watermark → window/state without
  * drift (timestamp_micros on both sides).
  *
  * Twins: q13 tumbling window (append), q14 session window with
  * cross-batch session merge (append), q67 native HLL sketch under
  * streaming state (complete — distinct aggs don't stream, which is
  * exactly why the mergeable sketch exists at 100 TB).
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

  private lazy val mapper =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  /** (message-json, ts_us) for every real event, in event-time order —
    * the loader's canonical ts_us becomes both the payload event time
    * and the envelope arrival_ts, exactly what a collector daemon
    * would write. */
  private lazy val replayRows: Seq[(String, Long)] = {
    val rows = graft.Tables.events(spark, sf)
      .select(to_json(struct(col("event_id"), col("user_id"),
        col("event_type"), col("value"), col("ts_us"))).as("msg"),
        col("ts_us"))
      .orderBy(col("ts_us"), col("msg"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.length > 100, s"unexpectedly small events table: ${rows.length}")
    rows
  }

  private def envelope(msg: String, seq: Long, tsUs: Long): String =
    s"""{"topic":"events/replay","message":${mapper.writeValueAsString(msg)},""" +
      s""""data_collector_id":1,"organization_id":1,"seq":$seq,"arrival_ts":$tsUs}"""

  /** Sentinel a day past the last event: advances the watermark so
    * every real window/session closes and emits; its own never does. */
  private def sentinel: (String, Long) = {
    val ts = replayRows.last._2 + 86400L * 1000000L
    (s"""{"event_id":-1,"user_id":-1,"event_type":"__sentinel__","value":0.0,"ts_us":$ts}""", ts)
  }

  private def writeHalf(dir: String, name: String, rows: Seq[(String, Long)],
                        startSeq: Long): Unit = {
    // atomic publish: the running query polls the directory by file
    // count, so a file must never be listable half-written — write
    // outside the watched dir, then move in atomically (exactly the
    // contract a real transport writer must follow)
    val tmp = Files.createTempFile("events_twin_stage", ".jsonl")
    Files.write(tmp,
      rows.zipWithIndex.map { case ((m, ts), i) => envelope(m, startSeq + i, ts) }
        .mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def parsedStream(dir: String): DataFrame =
    spark.readStream.format(fmt).load(dir)
      .select(from_json(col("message"), payloadSchema).as("e"))
      .select(col("e.*"))

  /** Runs `shape(stream)` over the replayed log in two micro-batches
    * (second includes the sentinel), returns the sink table. */
  private def runTwin(shape: DataFrame => DataFrame, mode: OutputMode,
                      queryName: String)(check: DataFrame => Unit): Unit = {
    val dir = Files.createTempDirectory("events_twin").toString
    val (first, second) = replayRows.splitAt(replayRows.length / 2)
    writeHalf(dir, "000001.jsonl", first, 0)
    val q = shape(parsedStream(dir))
      .writeStream.format("memory").queryName(queryName)
      .outputMode(mode).start()
    try {
      q.processAllAvailable()
      writeHalf(dir, "000002.jsonl", second :+ sentinel, first.length.toLong)
      q.processAllAvailable()
      check(spark.table(queryName))
    } finally q.stop()
  }

  test("q13 as readStream over the message log equals batch on real micros testdata") {
    // q13's aggregation shape (Streams.scala:24) minus the final sort —
    // identical expressions so the twin pins the real query
    def shape(df: DataFrame): DataFrame = df
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "1 minute")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
    runTwin(shape, OutputMode.Append, "events_twin_q13") { out =>
      def key(df: DataFrame) = df.collect().map { r =>
        (r.getAs[java.sql.Timestamp]("window_start").getTime,
          r.getString(1), r.getLong(2), r.getDouble(3))
      }.toSet
      val streamed = key(out)
      val batch = key(graft.queries.Streams.q13TumblingWindow(spark, sf))
      assert(streamed == batch,
        s"stream-batch drift: onlyStream=${streamed.diff(batch).take(3)} " +
          s"onlyBatch=${batch.diff(streamed).take(3)}")
      assert(streamed.nonEmpty)
      assert(!streamed.exists(_._2 == "__sentinel__")) // open window never emitted
    }
  }

  test("q14 session windows merge across micro-batches and equal batch") {
    // q14's shape (Streams.scala:38): 30-minute-gap sessionization —
    // the stateful merge case (a session spanning the file split must
    // come out as ONE row, not two)
    def shape(df: DataFrame): DataFrame = df
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "1 minute")
      .groupBy(session_window(col("event_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
    runTwin(shape, OutputMode.Append, "events_twin_q14") { out =>
      def key(df: DataFrame) = df.collect().map { r =>
        (r.getLong(0), r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getLong(3), r.getDouble(4))
      }.toSet
      val streamed = key(out).filter(_._1 >= 0) // drop nothing: sentinel never emits
      val batch = key(graft.queries.Streams.q14SessionWindow(spark, sf))
      assert(streamed == batch,
        s"stream-batch drift: onlyStream=${streamed.diff(batch).take(3)} " +
          s"onlyBatch=${batch.diff(streamed).take(3)}")
      assert(streamed.nonEmpty)
    }
  }

  test("q13 window state survives a stop/restart from a RocksDB checkpoint") {
    // The deployment shape: the collector daemon keeps appending log
    // files while the query is DOWN; on restart from the checkpoint the
    // file-count offset resumes past batch 1 and the recovered window
    // state absorbs the backlog — windows spanning the outage come out
    // whole, and the transactional file sink keeps output exactly-once.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("events_twin_restart").toString
      val ckpt = Files.createTempDirectory("events_twin_ckpt").toString
      val outDir = Files.createTempDirectory("events_twin_sink").toString
      def shape(df: DataFrame): DataFrame = df
        .withColumn("event_ts", timestamp_micros(col("ts_us")))
        .withWatermark("event_ts", "1 minute")
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
      def start() = shape(parsedStream(dir))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()

      val (first, second) = replayRows.splitAt(replayRows.length / 2)
      writeHalf(dir, "000001.jsonl", first, 0)
      val q1 = start()
      q1.processAllAvailable()
      q1.stop()

      writeHalf(dir, "000002.jsonl", second :+ sentinel, first.length.toLong)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      def key(df: DataFrame) = df.collect().map { r =>
        (r.getAs[java.sql.Timestamp]("window_start").getTime,
          r.getString(1), r.getLong(2), r.getDouble(3))
      }.toSet
      val resumed = key(spark.read.parquet(outDir))
      val batch = key(graft.queries.Streams.q13TumblingWindow(spark, sf))
      assert(resumed == batch,
        s"restart drift: onlySink=${resumed.diff(batch).take(3)} " +
          s"onlyBatch=${batch.diff(resumed).take(3)}")
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("q67 native HLL sketch aggregates under streaming state == batch sketch") {
    // q67's sketch columns (Streams.scala:158) without countDistinct:
    // distinct aggregations are unsupported in streaming — the
    // mergeable 4 KB sketch is the thing that DOES stream, which is
    // its whole reason to exist. Complete mode: state is the per-group
    // serialized HLL buffer, merged across micro-batches.
    def shape(df: DataFrame): DataFrame = df
      .filter(col("event_type") =!= "__sentinel__")
      .withColumn("k", concat(col("user_id").cast("string"), lit(":"),
        expr("ts_us div 86400000000").cast("string")))
      .groupBy(col("event_type"))
      .agg(graft.functions.GraftFunctions.hllDistinct(col("k")).as("sk"))
      .select(col("event_type"), col("sk.v_empty").as("v_empty"),
        expr("CAST(sk.s_fixed DIV 4294967296 AS BIGINT)").as("s_hi"),
        expr("CAST(sk.s_fixed % 4294967296 AS BIGINT)").as("s_lo"))
    runTwin(shape, OutputMode.Complete, "events_twin_q67") { out =>
      val streamed = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = graft.queries.Streams.q67ApproxDistinct(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch,
        s"sketch drift: onlyStream=${streamed.diff(batch)} onlyBatch=${batch.diff(streamed)}")
      assert(streamed.nonEmpty)
    }
  }
}
