package graft.streaming

import graft.etl.{Normalize, PacketSchema}
import graft.state.StateOps
import graft.state.StateOps.{Envelope, Rec}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

/** End-to-end packet pipeline assembly (SURVEY §3.2):
  *
  * {{{
  * raw messages (topic, message, data_collector_id, organization_id,
  *               seq, arrival_ts [, gw, gw_name])
  *   → route (F0) → per-dialect normalize (P*) → Rec
  *   → keyed state (F1+F2+F3 ChirpStack / F4 TTN)  [one shuffle on collector]
  *   → envelopes {ts, packet, messages[]}           (K1 shape)
  * }}}
  *
  * The same transforms run in batch (tests, replay) and streaming
  * (readStream → foreachBatch). Scale: normalization + codec are
  * data-parallel map work before the single state shuffle; only the
  * order-dependent pairing serializes per collector — exactly the
  * reference's per-collector thread, but collectors run in parallel and
  * state is checkpointable (vs the reference's crash-lossy heap dicts,
  * BASELINE.md "state durability: none").
  */
object Pipeline {

  /** The full packet row as a typed struct (field order = Pkt field
    * order = PacketSchema column order) — carried through the state
    * machine without serialization. */
  private val packetStructCol: Column =
    struct(PacketSchema.packetColumns.map(col): _*)

  /** Normalized radio rows (any dialect) → Rec rows. */
  private def radioRecs(norm: DataFrame, gwName: Column): DataFrame =
    norm.select(
      col("seq"),
      col("data_collector_id").as("collectorId"),
      col("route"),
      col("topic"),
      col("raw_message").as("message"),
      col("dev_addr").as("devAddr"),
      col("f_count").as("fCount"),
      col("dev_eui").as("devEui"),
      col("app_name").as("appName"),
      col("dev_name").as("devName"),
      col("latitude"), col("longitude"), col("altitude"),
      gwName.as("gwName"),
      packetStructCol.as("packet"),
      col("date").cast("long").as("arrivalTs"))

  private def emptyRec(df: DataFrame, route: String): DataFrame =
    df.select(
      col("seq"),
      col("data_collector_id").as("collectorId"),
      lit(route).as("route"),
      col("topic"),
      col("message"),
      lit(null).cast("string").as("devAddr"),
      lit(null).cast("long").as("fCount"),
      lit(null).cast("string").as("devEui"),
      lit(null).cast("string").as("appName"),
      lit(null).cast("string").as("devName"),
      lit(null).cast("double").as("latitude"),
      lit(null).cast("double").as("longitude"),
      lit(null).cast("double").as("altitude"),
      lit(null).cast("string").as("gwName"),
      lit(null).cast(PacketSchema.packet).as("packet"),
      col("arrival_ts").cast("long").as("arrivalTs"))

  /** ChirpStack: route + per-route normalization → Dataset[Rec].
    * F0h encoding sniff: the protobuf dialect (after transport-side
    * MessageToJson) is recognized by its `rxInfo.gatewayID` /
    * `txInfo.loRaModulationInfo` shape; plain JSON otherwise
    * (LoraServerIOCollector.py:238-280). */
  def toChirpRecs(df: DataFrame)(implicit s: SparkSession): Dataset[Rec] = {
    import s.implicits._
    val routed = df.withColumn("route", Normalize.chirpstackRoute(col("topic")))

    val radio = routed.filter(col("route") === "radio")
      .withColumn("dialect",
        when(get_json_object(col("message"), "$.rxInfo.gatewayID").isNotNull ||
          get_json_object(col("message"), "$.txInfo.loRaModulationInfo").isNotNull, "proto")
          .otherwise("json"))
    val radioJson = radioRecs(
      Normalize.chirpstackJsonRadio(radio.filter(col("dialect") === "json")),
      lit(null).cast("string"))
    val radioProto = radioRecs(
      Normalize.chirpstackProtoRadio(radio.filter(col("dialect") === "proto")),
      lit(null).cast("string"))

    val joins = emptyRec(routed.filter(col("route") === "join"), "join")
      .drop("devAddr", "devEui")
      .withColumn("devAddr", get_json_object(col("message"), "$.devAddr"))
      .withColumn("devEui", get_json_object(col("message"), "$.devEUI"))

    val appM = from_json(col("message"), PacketSchema.chirpstackApp)
    val apps = routed.filter(col("route") === "app").select(
      col("seq"),
      col("data_collector_id").as("collectorId"),
      lit("app").as("route"),
      col("topic"),
      col("message"),
      lit(null).cast("string").as("devAddr"),
      appM("fCnt").as("fCount"),
      appM("devEUI").as("devEui"),
      appM("applicationName").as("appName"),
      appM("deviceName").as("devName"),
      appM("rxInfo")(0)("location")("latitude").as("latitude"),
      appM("rxInfo")(0)("location")("longitude").as("longitude"),
      appM("rxInfo")(0)("location")("altitude").as("altitude"),
      appM("rxInfo")(0)("name").as("gwName"),
      lit(null).cast(PacketSchema.packet).as("packet"),
      col("arrival_ts").cast("long").as("arrivalTs"))

    val raws = emptyRec(routed.filter(col("route") === "raw"), "raw")

    radioJson.unionByName(radioProto).unionByName(joins).unionByName(apps)
      .unionByName(raws).as[Rec]
  }

  /** TTN v2/v3: normalize → Dataset[Rec] (routes radio|location|raw). */
  def toTtnRecs(df: DataFrame, v3: Boolean)(implicit s: SparkSession): Dataset[Rec] = {
    import s.implicits._
    val norm = if (v3) Normalize.ttnV3(df) else Normalize.ttnV2(df)
    val gwName = if (v3) col("gw_name") else lit(null).cast("string")
    // location + raw rows share the radio column layout here (the packet
    // struct is ignored downstream for non-radio routes)
    radioRecs(if (v3) norm else norm.withColumn("gw_name", lit(null).cast("string")),
      gwName).as[Rec]
  }

  // ------------------------------------------------------- state hookups

  /** Batch/streaming: ChirpStack state machine over Recs (F1+F2+F3). */
  def chirpEnvelopes(recs: Dataset[Rec])(implicit s: SparkSession): Dataset[Envelope] = {
    import s.implicits._
    recs.groupByKey(_.collectorId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StateOps.chirpFlatMap)
  }

  /** Batch/streaming: TTN location take-once (F4). */
  def ttnEnvelopes(recs: Dataset[Rec])(implicit s: SparkSession): Dataset[Envelope] = {
    import s.implicits._
    recs.groupByKey(_.collectorId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StateOps.locationFlatMap)
  }

  /** Batch fast path: ChirpStack raw messages → enveloped frame in ONE
    * state shuffle with a zero-deserialization fold
    * ([[graft.state.ChirpFoldInternal]]). Equivalent to
    * `envelopeFrame(chirpEnvelopes(toChirpRecs(raw)))` (pinned by
    * StateOpsSpec) but ~10× cheaper per message: the typed path decodes
    * each row into Option-boxed case classes, this one folds UnsafeRows.
    * Scale note: parallelism = number of collectors (the state is
    * per-collector ordered, exactly the reference's per-collector thread);
    * normalization before the fold is codegen'd map-side work. */
  def chirpEnvelopeFrameBatch(raw: DataFrame)(implicit s: SparkSession): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val recs = toChirpRecs(raw).toDF()
    val sorted = recs.repartition(col("collectorId"))
      .sortWithinPartitions(col("collectorId"), col("seq"))
    val folded = GraftColumnBridge.toInternalRdd(sorted)
      .mapPartitions(graft.state.ChirpFoldInternal.fold, preservesPartitioning = true)
    GraftColumnBridge.internalCreateDataFrame(s, folded,
      graft.state.ChirpFoldInternal.outputSchema)
  }

  // ---------------------------------------------------------- K1/K4 shape

  /** Envelope dataset → the sink DataFrame {ts, packet struct,
    * messages array} (FIXTURES.md §3a), packet enriched with the state
    * ops' outputs. */
  def envelopeFrame(envs: Dataset[Envelope]): DataFrame = {
    val p = col("packet")
    val pkt = p("packet") // the typed Pkt struct, no deserialization needed
    val enriched = pkt
      .withField("dev_eui", coalesce(p("devEui"), pkt("dev_eui")))
      .withField("app_name", coalesce(p("appName"), pkt("app_name")))
      .withField("dev_name", coalesce(p("devName"), pkt("dev_name")))
      .withField("latitude", coalesce(p("latitude"), pkt("latitude")))
      .withField("longitude", coalesce(p("longitude"), pkt("longitude")))
      .withField("altitude", coalesce(p("altitude"), pkt("altitude")))
    envs.toDF().select(
      col("ts"),
      col("collectorId").as("data_collector_id"),
      when(p.isNotNull, enriched).as("packet"),
      transform(col("messages"), m => struct(
        m("topic").as("topic"),
        m("message").as("message"),
        m("dataCollectorId").as("data_collector_id"))).as("messages"))
  }

  /** K1/K4 streaming sink: foreachBatch append to a parquet envelope log,
    * partitioned by collector (the dev stand-in for the RabbitMQ durable
    * queue; at-least-once via checkpoint + replayable source — the
    * idempotent consumer key is (data_collector_id, ts, packet.mic),
    * SURVEY §2.2 K1). */
  def startEnvelopeSink(envs: DataFrame, outDir: String, checkpoint: String,
                        trigger: Trigger = Trigger.ProcessingTime("1 second")) =
    envs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append")
          .partitionBy("data_collector_id")
          .parquet(outDir)
      }
      .start()
}
