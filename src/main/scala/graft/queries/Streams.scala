package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-shaped operators in their batch-queryable form (SURVEY §2.9
  * streaming windows + §2.5 F7/F9). The same window programs run under
  * readStream with a watermark (StreamingSpec); here they are
  * oracle-checked against DuckDB on the events table.
  *
  * `events.ts` arrives as nanos-since-epoch (Tables loader note); both
  * engines truncate to micros identically (`ts div 1000` vs DuckDB's
  * TIMESTAMP read of a nanos parquet column).
  */
object Streams {

  // integer `div`, not `/`: double division would round the microsecond
  // while the parquet nanos→micros read truncates
  private def eventTime = timestamp_micros(expr("ts div 1000"))

  /** q13: tumbling event-time window aggregation (the
    * `withWatermark + window()` shape, SURVEY §2.9). */
  def q13TumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("event_ts", eventTime)
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** q14: session windows — 30-minute gap sessionization per user
    * (`session_window` operator; end = last event + gap). */
  def q14SessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("event_ts", eventTime)
      .groupBy(session_window(col("event_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** q15: F9 config fan-out — the orchestrator's one-collector-per-CSV-
    * gateway explode (Orchestrator.py:279-291), synthesized from supplier
    * names. */
  def q15ConfigFanout(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .withColumn("gateway_csv",
        concat(col("s_name"), lit(","), col("s_name"), lit("-b")))
      .select(col("s_suppkey"),
        explode(split(col("gateway_csv"), ",")).as("gateway"))
      .orderBy(col("s_suppkey"), col("gateway"))

  /** q16: F7 status-change detection — emit only transitions (the
    * orchestrator's 5 s delta poll as a changelog query,
    * Orchestrator.py:88-135). */
  def q16StatusChanges(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q17: F6 last_seen tracking — per-key max arrival time
    * (LoraServerIOCollector.py:400,448 etc., as the groupBy/max shape). */
  def q17LastSeen(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(max(eventTime).as("last_seen"), count(lit(1)).as("n_messages"))
      .orderBy(col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_tumbling_window" -> (q13TumblingWindow _),
    "q17_last_seen"       -> (q17LastSeen _),
    "q14_session_window"  -> (q14SessionWindow _),
    "q15_config_fanout"   -> (q15ConfigFanout _),
    "q16_status_changes"  -> (q16StatusChanges _),
  )

  val oracle: Map[String, String] = Map(
    "q17_last_seen" ->
      """SELECT user_id, MAX(ts) AS last_seen, COUNT(*) AS n_messages
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q13_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q14_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >
        |              INTERVAL 30 MINUTE OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q15_config_fanout" ->
      """SELECT s_suppkey, unnest(string_split(s_name || ',' || s_name || '-b', ',')) AS gateway
        |FROM supplier ORDER BY s_suppkey, gateway""".stripMargin,
    "q16_status_changes" ->
      """WITH x AS (SELECT user_id, event_id, event_type, ts,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT user_id, event_id, event_type FROM x
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
