package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe: the full ChirpStack pipeline at REPLICAxsf0.1
  * message volume (default 10x), synthesized by crossing the event
  * stream with a replica index (distinct seq/collector per replica so
  * state cardinality grows with volume). Prints messages/second — the
  * number that must hold at cluster scale. */
object Stress50 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.functions.PhyFunctions
    val e0 = graft.Tables.events(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val nEvents = e0.count()
    val e = e0.crossJoin(spark.range(replicas).select(col("id").as("rep")))
      // distinct device/collector space per replica: state grows with volume
      .select(
        (col("event_id") * replicas + col("rep")).as("event_id"),
        (col("user_id") * replicas + col("rep")).as("user_id"),
        col("ts_us"))
    val devAddr = lpad(lower(hex(col("user_id") + 7)), 8, "0")
    val phyB64 = base64(PhyFunctions.encodeDataFrame(
      lit("UnconfirmedDataUp"), devAddr, lit(true), lit(false),
      (col("event_id") % 65536).cast("int"),
      lit(null).cast("int"), lit(null).cast("binary"), lit("00000000")))
    val joinMsg = concat(lit("""{"devAddr":""""), devAddr,
      lit("""","devEUI":"cafe"""), col("user_id"), lit("\"}"))
    val radioMsg = concat(
      lit("""{"phyPayload":""""), phyB64,
      lit("""","rxInfo":{"channel":1,"rfChain":0,"crcStatus":1,"codeRate":"4/5",
             |"rssi":-60,"loRaSNR":9.0,"size":17,"timestamp":""".stripMargin.replace("\n", "")),
      col("event_id"),
      lit(""","frequency":868100000,"mac":"aabb","dataRate":{"modulation":"LORA","spreadFactor":7,"bandwidth":125}}}"""))
    val raw: DataFrame = e.select(
      when(col("event_id") % 5 === 0, concat(lit("application/1/device/d"), col("user_id"), lit("/join")))
        .otherwise(lit("gateway/gw1/rx")).as("topic"),
      when(col("event_id") % 5 === 0, joinMsg).otherwise(radioMsg).as("message"),
      (col("user_id") % 256).as("data_collector_id"), // more collectors → state parallelism
      lit(1L).as("organization_id"),
      col("event_id").as("seq"),
      timestamp_micros(col("ts_us")).as("arrival_ts"))

    val n = nEvents * replicas
    val t0 = System.nanoTime()
    val envs = graft.streaming.Pipeline.chirpEnvelopeFrameBatch(raw)
      .queryExecution.toRdd.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stress50] $n%d msgs (${replicas}x), $envs%d envelopes, " +
      f"$secs%.1f s, ${n / secs}%.0f msgs/s")
    spark.stop()
  }
}
