package graft.etl

import graft.SparkSuite
import graft.codec.Lorawan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end normalization tests: synthesized source messages (shapes per
  * FIXTURES.md §2, golden PHY payloads from §1) → packet rows. */
class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val jrBytes: Array[Byte] =
    Array(0x00.toByte) ++ Lorawan.hexToLe("55d239ac716f234d") ++
      Lorawan.hexToLe("b827eb891cf50003") ++
      Array(0xb7.toByte, 0xc9.toByte) ++ Lorawan.hexToBytes("7005c4a5")
  private val jrB64 = Lorawan.b64encode(jrBytes)

  private val upBytes: Array[Byte] =
    Array(0x40.toByte) ++ Lorawan.hexToLe("017fc1c4") ++
      Array(0x82.toByte) ++ Array(17.toByte, 0.toByte) ++
      Array(0x03.toByte, 0x05.toByte) ++ Array(93.toByte) ++
      Lorawan.b64decode("/2EyELe4m4F5txMSp93Gi+Od7uT0wI/xFFPlKA==") ++
      Lorawan.hexToBytes("7934d552")
  private val upB64 = Lorawan.b64encode(upBytes)

  private def rawDf(rows: Seq[(String, String)]): DataFrame =
    rows.zipWithIndex.map { case ((t, m), i) => (t, m, i.toLong) }
      .toDF("topic", "message", "seq")
      .withColumn("data_collector_id", lit(7L))
      .withColumn("organization_id", lit(3L))
      .withColumn("gw", lit("eui-aabbccddeeff0011"))
      .withColumn("gw_name", lit("test-gw"))
      .withColumn("arrival_ts", to_timestamp(lit("2024-06-01 12:00:00")))

  test("ChirpStack JSON rx message normalizes (P8+P3+P15)") {
    val msg =
      s"""{"phyPayload":"$upB64","rxInfo":{"channel":2,"rfChain":1,"crcStatus":1,
         |"codeRate":"4/5","rssi":-57,"loRaSNR":9.5,"size":28,"timestamp":3216387843,
         |"frequency":868300000,"mac":"aabbccddeeff0011",
         |"dataRate":{"modulation":"LORA","spreadFactor":7,"bandwidth":125}}}"""
        .stripMargin.replace("\n", "")
    val out = Normalize.chirpstackJsonRadio(rawDf(Seq(("gateway/aabb/rx", msg))))
      .collect().head
    assert(out.getAs[String]("gateway") == "aabbccddeeff0011")
    assert(out.getAs[Long]("tmst") == 3216387843L)
    assert(out.getAs[Int]("chan") == 2)
    assert(out.getAs[Double]("freq") == 868.3)
    assert(out.getAs[Int]("stat") == 1)
    assert(out.getAs[String]("modu") == "LORA")
    assert(out.getAs[String]("datr") == """{"spread_factor":7,"bandwidth":125}""")
    assert(out.getAs[String]("codr") == "4/5")
    assert(out.getAs[Double]("lsnr") == 9.5)
    assert(out.getAs[String]("data") == upB64)
    assert(out.getAs[String]("m_type") == "UnconfirmedDataUp")
    assert(out.getAs[String]("dev_addr") == "017fc1c4")
    assert(out.getAs[Long]("f_count") == 17L)
    assert(out.getAs[String]("mic") == "7934d552")
    assert(out.getAs[Long]("data_collector_id") == 7L)
    assert(out.getAs[String]("route") == "radio")
  }

  test("ChirpStack oversized phyPayload dropped (F0c)") {
    val msg = s"""{"phyPayload":"${"A" * 301}","rxInfo":{"channel":1}}"""
    assert(Normalize.chirpstackJsonRadio(rawDf(Seq(("gateway/x/rx", msg)))).count() == 0)
  }

  test("ChirpStack protobuf-dialect up message normalizes (P9+P10)") {
    val gwIdB64 = Lorawan.b64encode(Lorawan.hexToBytes("aabbccddeeff0011"))
    val msg =
      s"""{"phyPayload":"$jrB64","rxInfo":{"gatewayID":"$gwIdB64","channel":5,
         |"rfChain":0,"crcStatus":"CRC_OK","rssi":-101,"loRaSNR":-3.2,"size":23},
         |"txInfo":{"frequency":915200000,"loRaModulationInfo":{
         |"spreadingFactor":10,"bandwidth":125,"codeRate":"4/5"}}}"""
        .stripMargin.replace("\n", "")
    val out = Normalize.chirpstackProtoRadio(rawDf(Seq(("gateway/aabb/up", msg))))
      .collect().head
    assert(out.getAs[String]("gateway") == "aabbccddeeff0011")
    assert(out.getAs[Int]("stat") == 1)
    assert(out.getAs[Double]("freq") == 915.2)
    assert(out.getAs[String]("datr") == """{"spread_factor":10,"bandwidth":125}""")
    assert(out.getAs[String]("m_type") == "JoinRequest")
    assert(out.getAs[String]("join_eui") == "55d239ac716f234d")
    // JoinRequests keep the PHY dev_eui (PhyParser.py:24; no dev_addr, so
    // F1 never touches them) — data frames parse null and F1 fills later
    assert(out.getAs[String]("dev_eui") == "b827eb891cf50003")
    assert(out.getAs[Int]("dev_nonce") == 51639)
  }

  test("ChirpStack topic router (F0e)") {
    val routes = Seq("gateway/gw1/rx", "gateway/gw1/tx", "gateway/gw1/up",
      "application/1/device/abc/rx", "application/1/node/abc/rx",
      "application/1/device/abc/join", "other/topic")
      .toDF("topic")
      .select(col("topic"), Normalize.chirpstackRoute(col("topic")).as("route"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(routes("gateway/gw1/rx") == "radio")
    assert(routes("gateway/gw1/tx") == "radio")
    assert(routes("gateway/gw1/up") == "radio")
    assert(routes("application/1/device/abc/rx") == "app")
    assert(routes("application/1/device/abc/join") == "join")
    assert(routes("other/topic") == "raw")
  }

  test("generic MQTT normalizes; datr/dev_eui scalar ops (P4-P7)") {
    val unpadded = jrB64.stripSuffix("=").stripSuffix("=") // P2 must re-pad
    val msg =
      s"""{"data":"$unpadded","chan":0,"stat":1,"lsnr":7.8,"rssi":-45,
         |"tmst":123456789,"rfch":1,"freq":867.5,"modu":"LORA","datr":"SF7BW125",
         |"codr":"4/5","size":23,"seqn":42,"opts":"00aa","port":12}"""
        .stripMargin.replace("\n", "")
    val out = Normalize.genericMqtt(rawDf(Seq(("lora/ab-cd-ef/up", msg))))
      .collect().head
    assert(out.getAs[String]("dev_eui") == "abcdef") // P6 topic regex, '-' stripped
    assert(out.getAs[String]("datr") == """{"spread_factor":"7","bandwidth":"125"}""")
    assert(out.getAs[String]("m_type") == "JoinRequest") // P2 padding worked
    assert(out.getAs[String]("join_eui") == "55d239ac716f234d")
    assert(out.getAs[Long]("tmst") == 123456789L)
    // uplink extras projected through (GenericMqttCollector.py:149-151)
    assert(out.getAs[Long]("seqn") == 42L)
    assert(out.getAs[String]("opts") == "00aa")
    assert(out.getAs[Int]("port") == 12)
    // F0b: no 'data' key → the reference early-returns AFTER the message
    // append (:122-125): no packet, the message rides into the next
    // envelope → route=perr_buf (same for invalid JSON and missing datr)
    val noData = Normalize.genericMqtt(rawDf(Seq(("t", """{"chan":1}"""))))
      .collect()
    assert(noData.length == 1 && noData.head.getAs[String]("route") == "perr_buf")
    assert(Normalize.genericMqtt(rawDf(Seq(("t", "not json"))))
      .collect().head.getAs[String]("route") == "perr_buf")
    // datr missing → parse_datr(None) re.search TypeError (:140): crash,
    // no packet — NOT a packet with null datr
    assert(Normalize.genericMqtt(rawDf(Seq(("lora/ab/up", s"""{"data":"$unpadded"}"""))))
      .collect().head.getAs[String]("route") == "perr_buf")
    // NUMERIC datr (packet-forwarder FSK uplink): re.search(pat, 50000)
    // raises too — only a STRING datr survives
    assert(Normalize.genericMqtt(rawDf(Seq(("lora/ab/up",
        s"""{"data":"$unpadded","datr":50000}"""))))
      .collect().head.getAs[String]("route") == "perr_buf")
    // ... but an EMPTY payload is NOT F0b: the reference skips the JSON
    // block and saves a metadata-only packet (GenericMqttCollector.py:119)
    val empty = Normalize.genericMqtt(
      rawDf(Seq(("lora/ab-cd/up", "")))).collect()
    assert(empty.length == 1)
    assert(empty.head.getAs[String]("route") == "radio")
    assert(empty.head.getAs[String]("dev_eui") == "abcd")
    assert(empty.head.getAs[String]("m_type") == null)
    assert(empty.head.getAs[String]("data") == null)
    // P6 is UNCONDITIONAL: a non-matching topic stores null, never the
    // phy-parsed join dev_eui (GenericMqttCollector.py:160 overwrites)
    val offTopic = Normalize.genericMqtt(
      rawDf(Seq(("devices/x/up",
        s"""{"data":"$unpadded","datr":"SF7BW125"}""")))).collect().head
    assert(offTopic.getAs[String]("route") == "radio")
    assert(offTopic.getAs[String]("m_type") == "JoinRequest")
    assert(offTopic.getAs[String]("dev_eui") == null)
    // P5: a non-SF..BW.. datr stringifies parse_datr's empty dict
    val fsk = Normalize.genericMqtt(
      rawDf(Seq(("lora/ab/up", s"""{"data":"$unpadded","datr":"50000"}""")))).collect().head
    assert(fsk.getAs[String]("datr") == "{}")
    assert(fsk.getAs[String]("route") == "radio") // a PRESENT datr never crashes
    // P7: '/joined' topic forces JoinAccept
    val joined = Normalize.genericMqtt(
      rawDf(Seq(("lora/ab/joined",
        s"""{"data":"$unpadded","datr":"SF7BW125"}""")))).collect().head
    assert(joined.getAs[String]("m_type") == "JoinAccept")
  }

  test("generic MQTT crash classes ride into the next envelope (perr_buf)") {
    implicit val s = spark
    val unpadded = jrB64.stripSuffix("=").stripSuffix("=")
    val good = s"""{"data":"$unpadded","datr":"SF7BW125"}"""
    val noDatr = s"""{"data":"$unpadded"}"""
    val envs = graft.streaming.Pipeline.genericEnvelopes(
      graft.streaming.Pipeline.toGenericRecs(rawDf(Seq(
        ("lora/ab/up", noDatr), ("lora/ab/up", "garbage"),
        ("lora/ab/up", good)))))
      .collect()
    assert(envs.length == 1) // the two crash messages saved no envelope
    assert(envs.head.messages.map(_.message) == Seq(noDatr, "garbage", good))
    assert(envs.head.packet.nonEmpty)
  }

  test("TTN v2 uplink + status frames (P11, P12, F0a, F0g)") {
    val payloadJson =
      s"""{"payload":"$upB64","snr":8.5,"rssi":-61,
         |"timestamp":"2024-06-01T10:20:30.5Z","frequency":868.1,
         |"coding_rate":"4/5","dev_eui":"B827EB891CF50003"}"""
        .stripMargin.replace("\n", "")
    val uplinkFrame = "a[\"gateway uplink " + payloadJson.replace("\"", "\\\"") + "\"]"
    val statusJson = """{"status":{"location":{"latitude":-34.6,"longitude":-58.4,"altitude":25.0}}}"""
    val statusFrame = "a[\"gateway status " + statusJson.replace("\"", "\\\"") + "\"]"
    val out = Normalize.ttnV2(rawDf(Seq(
      (null, "h"),                    // F0a keepalive: dropped
      // the server's reconnect frame is PERSISTED: TTNCollector.py:169
      // reconnects but falls through (no return) to the message append +
      // save, so the frame survives as a message-only route=raw row
      (null, """a["[200,\"disconnected\"]"]"""),
      (null, uplinkFrame),
      (null, statusFrame))))
      .orderBy(col("route"))
      .collect()
    assert(out.length == 3)
    val location = out(0); val up = out(1); val raw = out(2)
    assert(raw.getAs[String]("route") == "raw")
    assert(raw.getAs[String]("raw_message").contains("disconnected"))
    assert(raw.getAs[String]("m_type") == null) // message-only, no packet fields
    assert(up.getAs[String]("route") == "radio")
    assert(up.getAs[String]("gateway") == "aabbccddeeff0011") // eui- stripped
    assert(up.getAs[Long]("tmst") == 1717237230500L)          // epoch millis
    assert(up.getAs[Double]("freq") == 868.1)
    assert(up.getAs[Double]("lsnr") == 8.5)
    assert(up.getAs[String]("m_type") == "UnconfirmedDataUp")
    assert(up.getAs[String]("dev_eui") == "B827EB891CF50003")
    assert(up.getAs[String]("data") == upB64)
    assert(location.getAs[String]("route") == "location")
    assert(location.getAs[Double]("latitude") == -34.6)
    assert(location.getAs[Double]("altitude") == 25.0)
  }

  test("TTN v2 oversized frame: logged message truncated to 4096, parse unaffected (P16)") {
    // an uplink whose frame exceeds 4096 chars via a long ignored field
    val payloadJson =
      s"""{"payload":"$upB64","snr":8.5,"rssi":-61,
         |"timestamp":"2024-06-01T10:20:30.5Z","frequency":868.1,
         |"coding_rate":"4/5","dev_eui":"B827EB891CF50003","pad":"${"x" * 5000}"}"""
        .stripMargin.replace("\n", "")
    val frame = "a[\"gateway uplink " + payloadJson.replace("\"", "\\\"") + "\"]"
    assert(frame.length > 4096)
    val out = Normalize.ttnV2(rawDf(Seq((null, frame)))).collect().head
    assert(out.getAs[String]("raw_message").length == 4096)
    assert(out.getAs[String]("raw_message") == frame.substring(0, 4096))
    // the full frame was still parsed (payload precedes the padding)
    assert(out.getAs[String]("m_type") == "UnconfirmedDataUp")
    assert(out.getAs[String]("data") == upB64)
  }

  test("TTN v3 uplink / downlink / status / stream-start (F0d, F0f, P13)") {
    def rec(name: String, data: String) =
      s"""{"result":{"name":"$name","time":"2024-06-01T10:20:30Z",
         |"identifiers":[{"gateway_ids":{"gateway_id":"g1","eui":"AABBCCDDEEFF0011"}}],
         |"data":$data}}""".stripMargin.replace("\n", "")
    val up = rec("gs.up.receive",
      s"""{"raw_payload":"$upB64","rx_metadata":[{"snr":7.25,"rssi":-80}],
         |"settings":{"frequency":"868500000","coding_rate":"4/5"}}"""
        .stripMargin.replace("\n", ""))
    val down = rec("gs.down.send",
      s"""{"raw_payload":"$jrB64","request":{"rx1_frequency":869525000}}""")
    val status = rec("gs.status.receive",
      """{"antenna_locations":[{"latitude":52.1,"longitude":4.4,"altitude":7.0}]}""")
    val start = rec("events.stream.start", "{}")
    // malformed SSE line: json.loads raises at TTNv3Collector.py:210
    // BEFORE the message append — the reference records ONLY a parsing
    // error (:338-341), persisting nothing. The row must SURVIVE the
    // stream-start filter (name is NULL) and land on route=perr (kept as
    // a Rec for accounting, inert in locationStep: no envelope, nothing
    // buffered) — neither a raw message-envelope nor a vanished row.
    val garbled = "this is not json"
    // name-less but VALID record: processed normally (append + save, a
    // message-only envelope) → route=raw
    val nameless = """{"result":{"data":{}}}"""
    val out = Normalize.ttnV3(rawDf(Seq(
      (null, up), (null, down), (null, status), (null, start),
      (null, garbled), (null, nameless))))
      .collect()
    assert(out.length == 5) // stream.start dropped; garbled+nameless kept
    val perrRow = out.find(_.getAs[String]("route") == "perr").get
    assert(perrRow.getAs[String]("raw_message") == garbled)
    val rawRow = out.find(_.getAs[String]("route") == "raw").get
    assert(rawRow.getAs[String]("raw_message") == nameless)
    val upRow = out.find(_.getAs[String]("codr") == "4/5").get
    assert(upRow.getAs[Double]("freq") == 868.5)
    assert(upRow.getAs[Long]("tmst") == 1717237230000L)
    assert(upRow.getAs[String]("gateway") == "AABBCCDDEEFF0011")
    assert(upRow.getAs[Double]("lsnr") == 7.25)
    assert(upRow.getAs[String]("route") == "radio")
    val downRow = out.find(r => r.getAs[String]("m_type") == "JoinRequest").get
    assert(downRow.getAs[Double]("freq") == 869.525)
    assert(downRow.getAs[String]("codr") == null)
    // phy dev_eui kept: TTNv3Collector.py:322-324 only normalizes a
    // MISSING dev_eui to None, never clears a present one
    assert(downRow.getAs[String]("dev_eui") == "b827eb891cf50003")
    val statusRow = out.find(_.getAs[String]("route") == "location").get
    assert(statusRow.getAs[Double]("latitude") == 52.1)
  }

  test("TTN v2 struct-crash frames: perr_buf routing + ride-into-next-envelope") {
    implicit val s = spark
    def frame(payloadJson: String) =
      "a[\"gateway uplink " + payloadJson.replace("\"", "\\\"") + "\"]"
    val goodJson =
      s"""{"payload":"$upB64","timestamp":"2024-06-01T10:20:30Z","snr":1.0}"""
    val noTs = frame(s"""{"payload":"$upB64","snr":1.0}""")
    val badTs = frame(s"""{"payload":"$upB64","timestamp":"not a date"}""")
    val noPayload = frame("""{"timestamp":"2024-06-01T10:20:30Z"}""")
    val notDict = frame("""[1,2]""")
    val out = Normalize.ttnV2(rawDf(Seq(
      (null, noTs), (null, badTs), (null, noPayload), (null, notDict))))
      .collect()
    // all four raise inside the reference's outer try AFTER the message
    // append (parse(None)/ParserError at TTNCollector.py:233,
    // setPHYPayload(None) → bytes(None), .get on a list) — parsing error
    // only, the buffered message rides into the next envelope
    assert(out.forall(_.getAs[String]("route") == "perr_buf"),
      out.map(r => r.getAs[String]("route")).mkString(","))
    // a status frame whose payload has no location OBJECT crashes INSIDE
    // the inner try (:206-211) before any assignment: ws.location is
    // untouched and the frame falls through to append+save → raw, NOT a
    // location row that would null out pending coordinates
    val badStatus = "a[\"gateway status " +
      """{"status":"location text but no object"}""".replace("\"", "\\\"") + "\"]"
    val st = Normalize.ttnV2(rawDf(Seq((null, badStatus)))).collect().head
    assert(st.getAs[String]("route") == "raw")

    // e2e: [location, crash, good-radio] → the crash preserves the held
    // location AND its message rides: ONE radio envelope with BOTH
    // messages, enriched with the location set before the crash
    val statusFrame = "a[\"gateway status " +
      """{"status":{"location":{"latitude":-34.6,"longitude":-58.4,"altitude":25.0}}}"""
        .replace("\"", "\\\"") + "\"]"
    val good = frame(goodJson)
    val envs = graft.streaming.Pipeline.ttnEnvelopes(
      graft.streaming.Pipeline.toTtnRecs(
        rawDf(Seq((null, statusFrame), (null, noTs), (null, good))), v3 = false))
      .collect().sortBy(_.ts)
    assert(envs.length == 2) // status envelope + ONE radio envelope
    val radioEnv = envs.find(_.packet.nonEmpty).get
    assert(radioEnv.messages.map(_.message) == Seq(noTs, good))
    assert(radioEnv.packet.get.latitude.contains(-34.6)) // location survived the crash
  }

  test("TTN v3 struct-crash classes: perr_buf / perr split at the append point") {
    def rec(name: String, data: String, time: String = "2024-06-01T10:20:30Z",
            ids: String = """[{"gateway_ids":{"gateway_id":"g1","eui":"AA"}}]""") =
      s"""{"result":{"name":"$name","time":"$time","identifiers":$ids,"data":$data}}"""
    val buf = Seq(
      // settings present without an int()-able frequency (:277)
      rec("gs.up.receive", s"""{"raw_payload":"$upB64","settings":{"coding_rate":"4/5"}}"""),
      rec("gs.up.receive", s"""{"raw_payload":"$upB64","settings":{"frequency":"868.5e6"}}"""),
      // request present without rx1_frequency (:287 int(None))
      rec("gs.down.send", s"""{"raw_payload":"$jrB64","request":{"rx2_frequency":1}}"""),
      // raw_payload missing → setPHYPayload(None) → bytes(None)
      rec("gs.up.receive", """{"settings":{"frequency":"868500000"}}"""),
      // non-empty identifiers without the [0].gateway_ids.eui path (:312)
      rec("gs.up.receive", s"""{"raw_payload":"$upB64"}""",
        ids = """[{"gateway_ids":{"gateway_id":"g1"}}]"""),
      // unparseable non-empty time (:270)
      rec("gs.up.receive", s"""{"raw_payload":"$upB64"}""", time = "nope"))
    val bufOut = Normalize.ttnV3(rawDf(buf.map((null: String, _)))).collect()
    assert(bufOut.forall(_.getAs[String]("route") == "perr_buf"),
      bufOut.map(_.getAs[String]("route")).mkString(","))
    // pre-append crashes → perr: status without a data object (:229)
    val perr = Seq(
      """{"result":{"name":"gs.status.receive"}}""",
      """{"result":{"name":"gs.status.receive","data":5}}""",
      """{"result":5}""",
      """{"no_result":1}""")
    val perrOut = Normalize.ttnV3(rawDf(perr.map((null: String, _)))).collect()
    assert(perrOut.forall(_.getAs[String]("route") == "perr"),
      perrOut.map(_.getAs[String]("route")).mkString(","))
    // int()-faithful token typing: int(str) demands an integral string,
    // int(number) never raises (floats truncate) — so a STRING
    // "868500000.0" crashes (:277) while a NUMBER 868500000.0 is a valid
    // packet, and rx1_frequency accepts BOTH its proto-JSON string form
    // and a raw number token
    val floatStr = rec("gs.up.receive",
      s"""{"raw_payload":"$upB64","settings":{"frequency":"868500000.0"}}""")
    assert(Normalize.ttnV3(rawDf(Seq((null, floatStr)))).collect()
      .head.getAs[String]("route") == "perr_buf")
    val floatNum = rec("gs.up.receive",
      s"""{"raw_payload":"$upB64","settings":{"frequency":868500000.0}}""")
    val floatRow = Normalize.ttnV3(rawDf(Seq((null, floatNum)))).collect().head
    assert(floatRow.getAs[String]("route") == "radio")
    assert(floatRow.getAs[Double]("freq") == 868.5) // int() truncation
    val rx1Str = rec("gs.down.send",
      s"""{"raw_payload":"$jrB64","request":{"rx1_frequency":"869525000"}}""")
    val rx1Row = Normalize.ttnV3(rawDf(Seq((null, rx1Str)))).collect().head
    assert(rx1Row.getAs[String]("route") == "radio")
    assert(rx1Row.getAs[Double]("freq") == 869.525)
    // non-crashing near-misses stay radio: empty identifiers ([] is
    // falsy, :310), missing time (tmst None, :268), absent settings
    val ok = Seq(
      rec("gs.up.receive", s"""{"raw_payload":"$upB64"}""", ids = "[]"),
      s"""{"result":{"name":"gs.up.receive","data":{"raw_payload":"$upB64"}}}""")
    val okOut = Normalize.ttnV3(rawDf(ok.map((null: String, _)))).collect()
    assert(okOut.forall(_.getAs[String]("route") == "radio"),
      okOut.map(_.getAs[String]("route")).mkString(","))
  }

  test("all four dialect outputs union into one packet stream (SURVEY §2.9)") {
    val unpadded = jrB64
    val gw = rawDf(Seq(("gateway/g/rx",
      s"""{"phyPayload":"$upB64","rxInfo":{"channel":1,"rfChain":0,"crcStatus":1,"codeRate":"4/5","rssi":-57,"loRaSNR":9.5,"size":28,"timestamp":1,"frequency":868300000,"mac":"aa","dataRate":{"modulation":"LORA","spreadFactor":7,"bandwidth":125}}}""")))
    val generic = rawDf(Seq(("lora/ab/up",
      s"""{"data":"$unpadded","datr":"SF7BW125"}""")))
    val v2frame = "a[\"gateway uplink " +
      s"""{"payload":"$upB64","timestamp":"2024-06-01T10:20:30Z"}""".replace("\"", "\\\"") + "\"]"
    val v3rec =
      s"""{"result":{"name":"gs.up.receive","time":"2024-06-01T10:20:30Z","identifiers":[{"gateway_ids":{"gateway_id":"g","eui":"AA"}}],"data":{"raw_payload":"$upB64","rx_metadata":[{"snr":1.0,"rssi":-80}],"settings":{"frequency":"868500000","coding_rate":"4/5"}}}}"""
    val unified = Normalize.chirpstackJsonRadio(gw)
      .unionByName(Normalize.genericMqtt(generic).drop("gw_name"), allowMissingColumns = true)
      .unionByName(Normalize.ttnV2(rawDf(Seq((null, v2frame)))), allowMissingColumns = true)
      .unionByName(Normalize.ttnV3(rawDf(Seq((null, v3rec)))), allowMissingColumns = true)
    val rows = unified.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("m_type") != null))
    // every dialect lands in the SAME packet schema (union by name succeeded
    // and all packet columns resolve)
    graft.etl.PacketSchema.packetColumns.foreach { c =>
      assert(unified.columns.contains(c), s"missing packet column $c")
    }
  }

  test("parse-error rows carry error and no fields (PhyParser.py:10-12)") {
    val msg = s"""{"phyPayload":"!!!notb64!!!","rxInfo":{"channel":1,"rfChain":0,
      |"crcStatus":1,"codeRate":"4/5","rssi":-57,"loRaSNR":1.0,"size":4,
      |"timestamp":1,"frequency":868100000,"mac":"aa",
      |"dataRate":{"modulation":"LORA","spreadFactor":7,"bandwidth":125}}}"""
      .stripMargin.replace("\n", "")
    val out = Normalize.chirpstackJsonRadio(rawDf(Seq(("gateway/x/rx", msg))))
      .collect().head
    assert(out.getAs[String]("error") != null)
    assert(out.getAs[String]("m_type") == null)
  }

  // --------------------------- F0h raw-protobuf leg (gw.UplinkFrame) ----

  // minimal proto3 wire writer for the fixture (field numbers per the
  // public chirpstack-api v3 gw.proto — see ProtoWire's Scaladoc)
  private def vint(v: Long): Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    var x = v
    var more = true
    while (more) {
      val lo = (x & 0x7f).toInt; x = x >>> 7
      more = x != 0
      b += (if (more) lo | 0x80 else lo).toByte
    }
    b.toArray
  }
  private def pTag(f: Int, w: Int): Array[Byte] = vint((f << 3) | w)
  private def pLd(f: Int, c: Array[Byte]): Array[Byte] =
    pTag(f, 2) ++ vint(c.length) ++ c
  private def pV(f: Int, v: Long): Array[Byte] = pTag(f, 0) ++ vint(v)
  private def pD(f: Int, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    pTag(f, 1) ++ (0 to 7).map(i => ((bits >>> (8 * i)) & 0xff).toByte)
  }

  test("raw protobuf UplinkFrame equals its MessageToJson form (F0h)") {
    implicit val s = spark
    val gwIdBytes = Lorawan.hexToBytes("aabbccddeeff0011")
    val gwIdB64 = Lorawan.b64encode(gwIdBytes)
    val lmi = pV(1, 125) ++ pV(2, 10) ++ pLd(3, "4/5".getBytes("UTF-8"))
    val tx = pV(1, 915200000L) ++ pLd(3, lmi)
    val rx = pLd(1, gwIdBytes) ++ pV(5, -101L) ++ pD(6, -3.2) ++
      pV(7, 5) ++ pV(8, 1) ++ pV(17, 2) ++ // crc_status = CRC_OK
      pLd(16, Lorawan.hexToBytes("0102030405060708090a0b0c0d0e0f10")) // unknown uplink_id: skipped
    val frame = pLd(1, jrBytes) ++ pLd(2, tx) ++ pLd(3, rx)
    val protoMsg = Lorawan.b64encode(frame)
    val jsonMsg =
      s"""{"phyPayload":"$jrB64","rxInfo":{"gatewayID":"$gwIdB64","channel":5,
         |"rfChain":1,"crcStatus":"CRC_OK","rssi":-101,"loRaSNR":-3.2},
         |"txInfo":{"frequency":915200000,"loRaModulationInfo":{
         |"spreadingFactor":10,"bandwidth":125,"codeRate":"4/5"}}}"""
        .stripMargin.replace("\n", "")

    val recs = graft.streaming.Pipeline
      .toChirpRecs(rawDf(Seq(
        ("gateway/aabb/up", protoMsg),
        ("gateway/aabb/up", jsonMsg))))
      .collect().sortBy(_.seq)
    val Seq(fromProto, fromJson) = recs.toSeq
    assert(fromProto.route == "radio" && fromJson.route == "radio")
    // identical packet row from either transport (reference: ParseFromString
    // → MessageToJson feeds the same normalization)
    assert(fromProto.packet == fromJson.packet)
    assert(fromProto.packet.get.gateway.contains("aabbccddeeff0011"))
    assert(fromProto.packet.get.stat.contains(1)) // CRC_OK → 1
    assert(fromProto.packet.get.freq.contains(915.2))
    assert(fromProto.packet.get.datr
      .contains("""{"spread_factor":10,"bandwidth":125}"""))
    // the envelope keeps the transport form (b64 text) untouched
    assert(fromProto.message == protoMsg)
  }

  test("undecodable radio message re-routes to raw: no fabricated packet envelope") {
    implicit val s = spark
    // neither JSON nor protobuf parses → the reference's except path
    // persists a PACKET-LESS envelope (+ parsing error), never a
    // metadata-only packet (LoraServerIOCollector.py:243-280)
    val recs = graft.streaming.Pipeline
      .toChirpRecs(rawDf(Seq(
        ("gateway/aabb/up", "certainly not a frame !!"),
        ("gateway/aabb/rx", "also not json"))))
      .collect()
    assert(recs.length == 2)
    assert(recs.forall(_.route == "raw"))
    assert(recs.forall(_.packet.isEmpty))
    // a VALID-JSON radio message whose structure would crash the
    // reference's assembly block yields NO packet — the raise lands in
    // the outer except and only save_parsing_error runs
    // (LoraServerIOCollector.py:496-500). `{"rxInfo":{"rssi":-50}}`
    // crashes at `data_rate.get('modulation')` (:357-358, rxInfo has no
    // dataRate); route="perr" (inert in chirpStep), NOT a metadata-only
    // radio packet and NOT the flush-and-persist "raw" path.
    val meta = graft.streaming.Pipeline
      .toChirpRecs(rawDf(Seq(("gateway/aabb/rx", """{"rxInfo":{"rssi":-50}}"""))))
      .collect()
    assert(meta.head.route == "perr" && meta.head.packet.isEmpty)
    // a payload-less message with an intact rxInfo.dataRate DOES yield
    // the metadata-only packet (:311 guards only the phyPayload block)
    val ok = graft.streaming.Pipeline
      .toChirpRecs(rawDf(Seq(("gateway/aabb/rx",
        """{"rxInfo":{"rssi":-50,"mac":"aa","dataRate":{"modulation":"LORA","spreadFactor":7,"bandwidth":125}}}"""))))
      .collect()
    assert(ok.head.route == "radio" && ok.head.packet.nonEmpty)
  }

  test("struct-crash radio classes route to perr (outer except, :496-500)") {
    implicit val s = spark
    val crash = Seq(
      "123",                               // TypeError at `'phyPayload' in` (:311)
      "[1,2]",                             // NameError at x_info (:353)
      """{"foo":1}""",                     // neither rxInfo nor txInfo → NameError (:353)
      """{"rxInfo":null,"txInfo":{"dataRate":{"spreadFactor":7}}}""", // rxInfo None → AttributeError (:341)
      """{"rxInfo":5}""",                  // rxInfo not a dict → AttributeError (:341)
      """{"rxInfo":{"dataRate":{"spreadFactor":7}},"txInfo":{"timestamp":9}}""", // txInfo wins (:350-351) and has no dataRate → crash (:357)
      """{"rxInfo":{"dataRate":7}}""")     // dataRate not a dict → AttributeError (:358)
      .map(m => ("gateway/gw/rx", m))
    val recs = graft.streaming.Pipeline.toChirpRecs(rawDf(crash)).collect()
    assert(recs.forall(r => r.route == "perr" && r.packet.isEmpty),
      recs.map(r => s"${r.message} -> ${r.route}").mkString("; "))
    // proto dialect: rxInfo without gatewayID → b64decode(None) TypeError
    // (:324); txInfo without loRaModulationInfo (FSK frame) →
    // AttributeError (:335-338)
    val protoCrash = Seq(
      """{"rxInfo":{"rssi":-50},"txInfo":{"loRaModulationInfo":{"spreadingFactor":7}}}""",
      """{"rxInfo":{"gatewayID":"qrvM3e7/ABE="},"txInfo":{"frequency":868100000}}""")
      .map(m => ("gateway/gw/up", m))
    val protoRecs = graft.streaming.Pipeline.toChirpRecs(rawDf(protoCrash)).collect()
    assert(protoRecs.forall(r => r.route == "perr" && r.packet.isEmpty),
      protoRecs.map(r => s"${r.message} -> ${r.route}").mkString("; "))
    // the state machine treats perr as inert: no envelope, no prev flush
    val envs = graft.streaming.Pipeline.chirpEnvelopes(
      graft.streaming.Pipeline.toChirpRecs(rawDf(crash ++ protoCrash))).collect()
    assert(envs.isEmpty)
  }

  test("ChirpStack JoinRequest radio rows keep the PHY dev_eui (PhyParser.py:24)") {
    // rxInfo needs an object dataRate: without one the reference crashes
    // at data_rate.get (:357) and saves NO packet (the perr route)
    val msg = s"""{"phyPayload":"$jrB64","rxInfo":{"rssi":-50,"mac":"aa",
      |"dataRate":{"modulation":"LORA","spreadFactor":7,"bandwidth":125}}}"""
      .stripMargin.replace("\n", "")
    val row = Normalize.chirpstackJsonRadio(rawDf(Seq(("gateway/aa/rx", msg))))
      .collect().head
    assert(row.getAs[String]("m_type") == "JoinRequest")
    assert(row.getAs[String]("dev_eui") == "b827eb891cf50003")
    // and the fused streaming path lands the same value in the packet
    implicit val s = spark
    val rec = graft.streaming.Pipeline
      .toChirpRecs(rawDf(Seq(("gateway/aa/rx", msg))))
      .collect().head
    assert(rec.packet.get.dev_eui.contains("b827eb891cf50003"))
  }
}
