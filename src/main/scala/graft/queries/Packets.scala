package graft.queries

import graft.Tables._
import graft.etl.Normalize
import graft.functions.PhyFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Packet-pipeline operators exercised as oracle-checkable batch queries.
  *
  * The TESTDATA tables carry no LoRaWAN payloads, so these queries
  * SYNTHESIZE wire payloads deterministically from `events` columns,
  * push them through the real codec (encode → decode), and the DuckDB
  * oracle computes the expected decoded fields directly from the same
  * source columns with plain SQL — a true end-to-end check that the codec
  * is the identity on the synthesized domain. Codec correctness against
  * the reference's golden vectors is separately pinned by LorawanSpec.
  *
  * The F-op analogs (q22-q25) restate the reference's stateful semantics
  * (SURVEY §2.5 F1/F2/F4/F5) as window-function programs over the events
  * table — the batch-queryable twin of the streaming state ops in
  * graft.state, with the same last-write-wins / flush-on-next / take-once /
  * threshold-crossing semantics.
  */
object Packets {

  /** q20: codec round-trip — encode a JoinRequest per event row, decode it,
    * emit the decoded fields (C1/C10, lorawanWrapper.go:533-567 +
    * jsonUnmarshaler.go). */
  def q20CodecRoundtrip(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val joinEui = lpad(lower(hex(col("user_id") + 1)), 16, "0")
    val devEui = lpad(lower(hex(col("event_id") + 1)), 16, "0")
    val devNonce = (col("event_id") % 65536).cast("int")
    val mic = lpad(lower(hex(col("event_id") % 100000)), 8, "0")
    val bytes = PhyFunctions.encodeJoinRequest(joinEui, devEui, devNonce, mic)
    val phy = PhyFunctions.phy_decode(bytes)
    e.select(
        col("event_id"),
        phy("m_type").as("m_type"),
        phy("major").as("major"),
        phy("join_eui").as("join_eui"),
        phy("dev_eui").as("dev_eui"),
        phy("dev_nonce").as("dev_nonce"),
        phy("mic").as("mic"))
      .orderBy(col("event_id"))
  }

  /** q21: the scalar projection zoo (P2 b64pad, P5 datr parse, P6 topic
    * dev_eui, P10 CRC map) on synthesized inputs. */
  def q21ScalarOps(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val sf = (col("event_id") % 6 + 7).cast("string")
    val bw = (when(col("event_id") % 2 === 0, 125).otherwise(250)).cast("string")
    val datr = concat(lit("SF"), sf, lit("BW"), bw)
    val topic = concat(lit("lora/ab-"), col("event_id"), lit("/up"))
    val crc = when(col("event_id") % 3 === 0, "CRC_OK")
      .when(col("event_id") % 3 === 1, "BAD_CRC").otherwise("NO_CRC")
    val rawB64 = expr("substring('QUJDREVGRw', 1, cast(event_id % 7 + 4 as int))")
    e.select(
        col("event_id"),
        Normalize.datrParse(datr).as("datr_parsed"),
        Normalize.devEuiFromTopic(topic).as("dev_eui"),
        Normalize.crcStatusInt(crc).as("stat"),
        // P2 base64 right-pad as a pure column expression
        concat(rawB64, expr(
          "repeat('=', cast((4 - length(substring('QUJDREVGRw', 1, cast(event_id % 7 + 4 as int))) % 4) % 4 as int))"))
          .as("data_padded"))
      .orderBy(col("event_id"))
  }

  /** q22: F1 device-map analog — last-write-wins keyed state as a window
    * program. 'signup' events write the map; every event reads it
    * (LoraServerIOCollector.py:287-304,436-446). */
  def q22DeviceMapLww(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .withColumn("dev_eui",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("dev_eui"))
      .orderBy(col("event_id"))
  }

  /** q23: F2 pairing analog — buffer-size-1, flush-on-next-event: a 'view'
    * is enriched by the immediately following event iff it is a 'click'
    * (LoraServerIOCollector.py:368-399,411-459). */
  def q23PairingAsOf(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_id", lead(col("event_id"), 1).over(w))
      .filter(col("event_type") === "view")
      .select(
        col("event_id"), col("user_id"),
        when(col("next_type") === "click", col("next_id")).as("paired_with"))
      .orderBy(col("event_id"))
  }

  /** q24: F4 location take-once analog — an 'error' event holds a value;
    * the NEXT non-error event consumes it, and it is consumed at most once
    * (TTNCollector.py:202-209,241-247: read-and-clear). */
  def q24LocationTakeOnce(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, -1)
    val wCur = wAll.rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .withColumn("held_val",
        last(when(col("event_type") === "error", col("value")), ignoreNulls = true).over(wCur))
      .withColumn("held_ts",
        last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(wCur))
      .withColumn("prev_consumer_ts",
        last(when(col("event_type") =!= "error", col("ts")), ignoreNulls = true).over(wPrev))
      .filter(col("event_type") =!= "error")
      .select(
        col("event_id"), col("user_id"),
        when(col("held_ts").isNotNull &&
          (col("prev_consumer_ts").isNull || col("held_ts") > col("prev_consumer_ts")),
          col("held_val")).as("location"))
      .orderBy(col("event_id"))
  }

  /** q25: F5 verification-gate analog — running (total, ok) counters per
    * key; emit the first row where `total ≥ 5 ∧ ok/total > 0.8` flips true
    * (BaseCollector.py:85-110, thresholds :11-12). */
  def q25VerificationGate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("total", count(lit(1)).over(w))
      .withColumn("ok",
        sum(when(col("event_type").isin("click", "view", "purchase"), 1).otherwise(0)).over(w))
      .withColumn("verified",
        col("total") >= 5 && col("ok") * lit(5) > col("total") * lit(4))
      .withColumn("was_verified", lag(col("verified"), 1, false).over(wSeq))
      .filter(col("verified") && !col("was_verified"))
      .select(col("user_id"), col("event_id"), col("total"), col("ok"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q26: the error route (K3 dead-letter, PhyParser.py:10-12) driven
    * through the oracle gate — a mixed stream of valid JoinRequests and
    * garbage payloads; decode must tag exactly the garbage rows with an
    * error and leave their fields null. */
  def q26DecodeErrors(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val valid = PhyFunctions.encodeJoinRequest(
      lpad(lower(hex(col("user_id") + 1)), 16, "0"),
      lpad(lower(hex(col("event_id") + 1)), 16, "0"),
      (col("event_id") % 65536).cast("int"), lit("00000000"))
    val payload = when(col("event_id") % 3 === 0,
      base64(valid)).otherwise(concat(lit("!garbage!"), col("event_id")))
    val phy = PhyFunctions.phy_decode_b64(payload)
    e.select(
        col("event_id"),
        phy("error").isNotNull.as("is_error"),
        phy("m_type").as("m_type"),
        phy("dev_eui").as("dev_eui"))
      .orderBy(col("event_id"))
  }

  /** q27: the reference's ORM point-lookup shapes (Q1-Q4,
    * DataCollector.py:40-55) — conjunctive selection + first-row. */
  def q27PointLookup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_nationkey") === 5 && col("c_mktsegment") === "BUILDING" &&
        col("c_acctbal") > 0)
      .orderBy(col("c_custkey"))
      .limit(1)

  /** q28: AppKey search (C9, lorawanWrapper.go:245-385) — the one workload
    * where the reference would want a cluster: candidateKeys ⋈ joinPackets
    * filtered on MIC validity. Packets are synthesized and signed with the
    * key derived from their user_id; Spark must FIND that key by testing
    * every candidate (AES-CMAC per pair, broadcast candidate set, no
    * shuffle of the packet side); the oracle knows it by construction. */
  def q28KeyBruteforce(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).filter(col("event_id") < 200)
    val keyHex = lpad(lower(hex(col("user_id"))), 32, "0")
    val jr = PhyFunctions.encodeJoinRequest(
      lpad(lower(hex(col("user_id") + 1)), 16, "0"),
      lpad(lower(hex(col("event_id") + 1)), 16, "0"),
      (col("event_id") % 65536).cast("int"),
      lit("00000000"))
    // all signed packets packed into ONE broadcast row — the packet side
    // is small by construction (the key space is what grows), and the
    // candidate-major orientation lets one CmacSession amortize the AES
    // key schedule over every packet
    val packed = e.select(col("event_id"),
        PhyFunctions.signPacketUdf(jr, keyHex).as("bytes"))
      .agg(collect_list(struct(col("event_id"), col("bytes"))).as("pkts"))
    val candidates = events(s, d)
      .select(lpad(lower(hex(col("user_id"))), 32, "0").as("cand_key")).distinct()
      // candidates are the streamed side: the key space scales, packets don't
      .repartition(s.sparkContext.defaultParallelism)
    candidates.crossJoin(broadcast(packed))
      .select(col("cand_key"),
        explode(PhyFunctions.micMatchEvents(col("cand_key"), col("pkts"))).as("event_id"))
      .select(col("event_id"), col("cand_key").as("found_key"))
      .orderBy(col("event_id"))
  }

  /** q48: the C9 structured key-pattern generators
    * (lorawanWrapper.go:283-356) — the reference's three 65,536-pattern
    * AppKey templates, generated on the cluster instead of a driver loop:
    * key1 sets byte0 = i and bytes1..15 = j; key2 alternates i/j on
    * even/odd byte positions; key3 zeroes bytes0..13 and varies the last
    * two. `spark.range(65536)` × 3 templates (`explode`), deduped (the
    * all-equal keys appear in several templates), broadcast against the
    * signed join packets, MIC-validated. Packets are signed with
    * key3-shaped keys derived from their row, so the oracle knows every
    * hit by construction — Spark must rediscover them by testing all
    * 196,608 candidates (~1.6M AES-CMACs here; embarrassingly parallel,
    * no shuffle of either side at scale beyond the candidate broadcast). */
  def q48KeyPatterns(s: SparkSession, d: String): DataFrame = {
    def hex2(c: Column) = lpad(lower(hex(c)), 2, "0")
    val gen = s.range(65536).select(
      hex2((col("id") / 256).cast("int")).as("hi"),
      hex2((col("id") % 256).cast("int")).as("hj"))
    val cands = gen.select(explode(array(
        concat(col("hi"), repeat(col("hj"), 15)),
        repeat(concat(col("hi"), col("hj")), 8),
        concat(lit("0" * 28), col("hi"), col("hj")))).as("cand_key"))
      .distinct()
    val e = events(s, d).filter(col("event_id") < 8)
    val keyHex = concat(lit("0" * 28),
      hex2((col("user_id") % 256).cast("int")),
      hex2((col("event_id") % 256).cast("int")))
    val jr = PhyFunctions.encodeJoinRequest(
      lpad(lower(hex(col("user_id") + 1)), 16, "0"),
      lpad(lower(hex(col("event_id") + 1)), 16, "0"),
      (col("event_id") % 65536).cast("int"),
      lit("00000000"))
    // the reference loops keys in the outer loop; here the 196,608-key
    // candidate table is the STREAMED side (partitioned across the
    // cluster) and the handful of packets broadcast AS ONE PACKED ROW —
    // the orientation that scales with the generated key space, and the
    // packing lets each candidate derive its AES key schedule + CMAC
    // subkeys once for all packets (one UDF call per key, not per pair)
    val packed = e.select(col("event_id"),
        PhyFunctions.signPacketUdf(jr, keyHex).as("bytes"))
      .agg(collect_list(struct(col("event_id"), col("bytes"))).as("pkts"))
    cands.repartition(s.sparkContext.defaultParallelism)
      .crossJoin(broadcast(packed))
      .select(col("cand_key"),
        explode(PhyFunctions.micMatchEvents(col("cand_key"), col("pkts"))).as("event_id"))
      .select(col("event_id"), col("cand_key").as("found_key"))
      .orderBy(col("event_id"), col("found_key"))
  }

  /** q29: session-key derivation over a JoinRequest ⋈ JoinAccept as-of
    * pairing (C7, lorawanWrapper.go:111-159 + the upstream JR⋈JA self-join
    * SURVEY §2.8 calls for). JR rows pair with the next JA row per device
    * (as-of via window lead); keys derive from the pair + AppKey.
    * Rows-only check: AES is not SQL-expressible — crypto correctness is
    * pinned by LorawanCryptoSpec. */
  def q29SessionKeys(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, d).filter(col("event_id") < 400)
    val appKey = lpad(lower(hex(col("user_id"))), 32, "0")
    val devAddr = lpad(lower(hex(col("user_id") + 7)), 8, "0")
    // alternate rows act as JR / JA "packets" of the same device
    val tagged = e.withColumn("kind",
        when(col("event_id") % 2 === 0, "jr").otherwise("ja"))
      .withColumn("jr_bytes", PhyFunctions.signPacketUdf(
        PhyFunctions.encodeJoinRequest(
          lpad(lower(hex(col("user_id") + 1)), 16, "0"),
          lpad(lower(hex(col("event_id") + 1)), 16, "0"),
          (col("event_id") % 65536).cast("int"), lit("00000000")),
        appKey))
      .withColumn("ja_bytes", PhyFunctions.encodeJoinAccept(
        appKey, (col("event_id") % 16777216).cast("int"), lit("aabbcc"), devAddr))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val paired = tagged
      .withColumn("next_kind", lead(col("kind"), 1).over(w))
      .withColumn("next_ja", lead(col("ja_bytes"), 1).over(w))
      .filter(col("kind") === "jr" && col("next_kind") === "ja")
    val keys = PhyFunctions.sessionKeys(col("jr_bytes"), col("next_ja"), appKey)
    paired.select(col("event_id"), col("user_id"),
        keys("nwkSKey").as("nwk_s_key"), keys("appSKey").as("app_s_key"))
      .filter(col("nwk_s_key").isNotNull)
      .orderBy(col("event_id"))
  }

  /** q50: the reference's ACTUAL workload end-to-end as one benchable
    * query — synthesized ChirpStack message stream (join + gateway-radio
    * messages) through route → normalize → PHY decode → keyed state
    * (F1/F2/F3) → envelope frame, aggregated. The reference processes
    * this path one GIL-bound Python callback + one FFI call per message
    * (SURVEY §4.3); here it is codegen'd normalization at partition
    * parallelism with one state shuffle. Rows-only check (envelope
    * emission depends on the state machine; its semantics are pinned by
    * StateOpsSpec + the q22-q25 window-analog oracles). */
  def q50PipelineE2e(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    // The sf parquet is one file → one scan partition, which would run the
    // whole map-side normalize on a single core. A real message source
    // (MQTT consumer, log replay) delivers many partitions; spread the
    // narrow 3-column event rows first so synth+normalize run at full
    // parallelism. (At cluster scale the source is already partitioned and
    // this is a no-op-sized shuffle of the keys.)
    val e = events(s, d).repartition(s.sparkContext.defaultParallelism)
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
    val raw = e.select(
      when(col("event_id") % 5 === 0, concat(lit("application/1/device/d"), col("user_id"), lit("/join")))
        .otherwise(lit("gateway/gw1/rx")).as("topic"),
      when(col("event_id") % 5 === 0, joinMsg).otherwise(radioMsg).as("message"),
      (col("user_id") % 8).as("data_collector_id"),
      lit(1L).as("organization_id"),
      col("event_id").as("seq"),
      timestamp_micros(expr("ts div 1000")).as("arrival_ts"))
    val envs = graft.streaming.Pipeline.chirpEnvelopeFrameBatch(raw)
    envs.groupBy(col("data_collector_id"))
      .agg(
        count(lit(1)).as("n_envelopes"),
        sum(when(col("packet").isNotNull, 1).otherwise(0)).as("n_packets"),
        sum(when(col("packet")("dev_eui").isNotNull, 1).otherwise(0)).as("n_enriched"))
      .orderBy(col("data_collector_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_pipeline_e2e"       -> (q50PipelineE2e _),
    "q26_decode_errors"      -> (q26DecodeErrors _),
    "q28_key_bruteforce"     -> (q28KeyBruteforce _),
    "q48_key_patterns"       -> (q48KeyPatterns _),
    "q29_session_keys"       -> (q29SessionKeys _),
    "q20_codec_roundtrip"    -> (q20CodecRoundtrip _),
    "q21_scalar_ops"         -> (q21ScalarOps _),
    "q22_device_map_lww"     -> (q22DeviceMapLww _),
    "q23_pairing_asof"       -> (q23PairingAsOf _),
    "q24_location_take_once" -> (q24LocationTakeOnce _),
    "q25_verification_gate"  -> (q25VerificationGate _),
    "q27_point_lookup"       -> (q27PointLookup _),
  )

  val oracle: Map[String, String] = Map(
    "q26_decode_errors" ->
      """SELECT event_id,
        |  (event_id % 3 <> 0) AS is_error,
        |  CASE WHEN event_id % 3 = 0 THEN 'JoinRequest' END AS m_type,
        |  CASE WHEN event_id % 3 = 0 THEN lpad(lower(hex(event_id + 1)), 16, '0') END AS dev_eui
        |FROM events ORDER BY event_id""".stripMargin,
    "q28_key_bruteforce" ->
      """SELECT event_id, lpad(lower(hex(user_id)), 32, '0') AS found_key
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,
    "q48_key_patterns" ->
      """SELECT event_id,
        |  repeat('0', 28) || lpad(lower(hex(user_id % 256)), 2, '0')
        |    || lpad(lower(hex(event_id % 256)), 2, '0') AS found_key
        |FROM events WHERE event_id < 8 ORDER BY event_id, found_key""".stripMargin,
    // The chirp state machine's emissions over the q50 synth stream (join
    // + radio only) reduce to window logic per collector:
    //   join  -> one packet-less envelope, always (its message list is
    //            never empty); registers the user's devAddr;
    //   radio -> map hit (an EARLIER join by the same user) emits one
    //            enriched packet envelope; a miss buffers;
    //   flush -> a radio emits the pending buffer iff the most recent
    //            prior radio was a miss AND no join intervened (a join
    //            absorbs the buffered message, so the later flush is
    //            message-less and dropped by the save() gate);
    //   the final buffered miss of a collector is never emitted.
    "q50_pipeline_e2e" ->
      """WITH ev AS (
        |  SELECT event_id AS seq, user_id, user_id % 8 AS cid,
        |         (event_id % 5 = 0) AS is_join
        |  FROM events),
        |hits AS (
        |  SELECT *, (NOT is_join) AND COALESCE(
        |      MAX(CASE WHEN is_join THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY seq
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |      AS is_hit
        |  FROM ev),
        |st AS (
        |  SELECT *,
        |    last_value(CASE WHEN NOT is_join THEN is_hit END IGNORE NULLS)
        |      OVER w AS prev_radio_hit,
        |    last_value(CASE WHEN NOT is_join THEN seq END IGNORE NULLS)
        |      OVER w AS prev_radio_seq,
        |    last_value(CASE WHEN is_join THEN seq END IGNORE NULLS)
        |      OVER w AS prev_join_seq
        |  FROM hits
        |  WINDOW w AS (PARTITION BY cid ORDER BY seq
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |em AS (
        |  SELECT cid,
        |    CASE WHEN is_join OR is_hit THEN 1 ELSE 0 END
        |      + CASE WHEN (NOT is_join) AND COALESCE(NOT prev_radio_hit, FALSE)
        |                  AND (prev_join_seq IS NULL OR prev_join_seq < prev_radio_seq)
        |             THEN 1 ELSE 0 END AS envs,
        |    CASE WHEN (NOT is_join) AND is_hit THEN 1 ELSE 0 END
        |      + CASE WHEN (NOT is_join) AND COALESCE(NOT prev_radio_hit, FALSE)
        |                  AND (prev_join_seq IS NULL OR prev_join_seq < prev_radio_seq)
        |             THEN 1 ELSE 0 END AS pkts,
        |    CASE WHEN (NOT is_join) AND is_hit THEN 1 ELSE 0 END AS enr
        |  FROM st)
        |SELECT cid AS data_collector_id,
        |  CAST(SUM(envs) AS BIGINT) AS n_envelopes,
        |  CAST(SUM(pkts) AS BIGINT) AS n_packets,
        |  CAST(SUM(enr) AS BIGINT) AS n_enriched
        |FROM em GROUP BY cid ORDER BY data_collector_id""".stripMargin,
    "q20_codec_roundtrip" ->
      """SELECT event_id,
        |  'JoinRequest' AS m_type, 'LoRaWANR1' AS major,
        |  lpad(lower(hex(user_id + 1)), 16, '0') AS join_eui,
        |  lpad(lower(hex(event_id + 1)), 16, '0') AS dev_eui,
        |  CAST(event_id % 65536 AS INTEGER) AS dev_nonce,
        |  lpad(lower(hex(event_id % 100000)), 8, '0') AS mic
        |FROM events ORDER BY event_id""".stripMargin,
    "q21_scalar_ops" ->
      """SELECT event_id,
        |  '{"spread_factor":"' || CAST(event_id % 6 + 7 AS VARCHAR) ||
        |    '","bandwidth":"' || (CASE WHEN event_id % 2 = 0 THEN '125' ELSE '250' END) ||
        |    '"}' AS datr_parsed,
        |  'ab' || CAST(event_id AS VARCHAR) AS dev_eui,
        |  CAST(CASE WHEN event_id % 3 = 0 THEN 1 WHEN event_id % 3 = 1 THEN -1 ELSE 0 END AS INTEGER) AS stat,
        |  substring('QUJDREVGRw', 1, CAST(event_id % 7 + 4 AS INTEGER)) ||
        |    repeat('=', CAST((4 - length(substring('QUJDREVGRw', 1, CAST(event_id % 7 + 4 AS INTEGER))) % 4) % 4 AS INTEGER)) AS data_padded
        |FROM events ORDER BY event_id""".stripMargin,
    "q22_device_map_lww" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dev_eui
        |FROM events ORDER BY event_id""".stripMargin,
    "q23_pairing_asof" ->
      """WITH x AS (
        |  SELECT event_id, user_id, event_type,
        |    LEAD(event_type, 1) OVER w AS next_type,
        |    LEAD(event_id, 1) OVER w AS next_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |  CASE WHEN next_type = 'click' THEN next_id END AS paired_with
        |FROM x WHERE event_type = 'view' ORDER BY event_id""".stripMargin,
    "q24_location_take_once" ->
      """WITH x AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    last_value(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS held_val,
        |    last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS held_ts,
        |    last_value(CASE WHEN event_type <> 'error' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_consumer_ts
        |  FROM events)
        |SELECT event_id, user_id,
        |  CASE WHEN held_ts IS NOT NULL AND
        |            (prev_consumer_ts IS NULL OR held_ts > prev_consumer_ts)
        |       THEN held_val END AS location
        |FROM x WHERE event_type <> 'error' ORDER BY event_id""".stripMargin,
    "q25_verification_gate" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    COUNT(*) OVER wc AS total,
        |    CAST(SUM(CASE WHEN event_type IN ('click','view','purchase') THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS ok
        |  FROM events
        |  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |y AS (
        |  SELECT user_id, event_id, total, ok,
        |    (total >= 5 AND ok * 5 > total * 4) AS verified,
        |    COALESCE(LAG(total >= 5 AND ok * 5 > total * 4, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id), FALSE) AS was_verified
        |  FROM x)
        |SELECT user_id, event_id, total, ok FROM y
        |WHERE verified AND NOT was_verified
        |ORDER BY user_id, event_id""".stripMargin,
    "q27_point_lookup" ->
      """SELECT * FROM customer
        |WHERE c_nationkey = 5 AND c_mktsegment = 'BUILDING' AND c_acctbal > 0
        |ORDER BY c_custkey LIMIT 1""".stripMargin,
  )
}
