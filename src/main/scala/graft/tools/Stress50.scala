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
    // shared q50 synth (Packets.synthRawMessages); 256 collectors for
    // state parallelism instead of the graded query's 8
    val raw: DataFrame = graft.queries.Packets.synthRawMessages(e, collectors = 256)

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
