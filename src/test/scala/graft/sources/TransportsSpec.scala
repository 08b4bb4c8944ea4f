package graft.sources

import graft.SparkSuite
import graft.sources.Transports._

import scala.collection.mutable.ArrayBuffer

/** Lifecycle proofs for the S1-S3 transport pumps against scripted
  * fakes: subscribe/status/test-probe behavior (MQTT), the v2 token
  * dance with refresh/failure/reconnect and the [200,"disconnected"]
  * fall-through, the v3 SSE state machine and chunk framing, and the
  * SegmentLogWriter → MessageLogSource → normalize integration. */
class TransportsSpec extends SparkSuite {

  private class Captured extends TransportOutput {
    val frames = new ArrayBuffer[(Option[String], String)]
    val statuses = new ArrayBuffer[String]
    var loginErrors = 0
    val testEvents = new ArrayBuffer[(String, String)]
    override def frame(topic: Option[String], message: String): Unit =
      frames += ((topic, message))
    override def status(value: String): Unit = statuses += value
    override def loginError(): Unit = loginErrors += 1
    override def testEvent(kind: String, message: String): Unit =
      testEvents += ((kind, message))
  }

  // ---------------------------------------------------------- MQTT (S1)

  private final class FakeMqtt(connectInsideOpen: Boolean = false)
    extends MqttConnector {
    @transient var callbacks: MqttCallbacks = _
    @transient var lastClient: MqttClient = _
    @transient val subscribed = new ArrayBuffer[Seq[String]]
    @transient var disconnects = 0
    @transient var opens = 0
    @transient var lastCredentials: Option[(String, String)] = None
    override def open(host: String, port: Int, keepaliveSecs: Int,
                      credentials: Option[(String, String)],
                      cb: MqttCallbacks): MqttClient = {
      opens += 1
      lastCredentials = credentials
      callbacks = cb
      lastClient = new MqttClient {
        override def subscribe(topics: Seq[String]): Unit = subscribed += topics
        override def disconnect(): Unit = disconnects += 1
      }
      // some client libraries finish the handshake synchronously inside
      // open(): the callback fires before the pump's field assignment
      if (connectInsideOpen) cb.onConnect(lastClient, 0)
      lastClient
    }
    def fire[A](f: MqttCallbacks => A): A = f(callbacks)
  }

  test("MQTT pump: subscribe-on-connect, status transitions, idempotent connect") {
    val out = new Captured
    val fake = new FakeMqtt
    val pump = new MqttPump(fake, "broker", 1883, Seq("gateway/+/up", "lora/#"),
      Some(("u", "p")), out)
    pump.connect()
    pump.connect() // 'Existing connection' guard — no second open
    assert(fake.opens == 1)
    assert(fake.lastCredentials.contains(("u", "p")))
    fake.fire(_.onConnect(fake.lastClient, 0))
    assert(fake.subscribed == Seq(Seq("gateway/+/up", "lora/#")))
    assert(out.statuses == Seq("CONNECTED"))
    fake.fire(_.onMessage(fake.lastClient, "gateway/gw1/up", "{}"))
    assert(out.frames == Seq((Some("gateway/gw1/up"), "{}")))
    fake.fire(_.onDisconnect(fake.lastClient, 1)) // unexpected → DISCONNECTED
    fake.fire(_.onDisconnect(fake.lastClient, 0)) // clean → no transition
    assert(out.statuses == Seq("CONNECTED", "DISCONNECTED"))
    pump.disconnect()
    assert(fake.disconnects == 1)
  }

  test("MQTT pump: handshake completing inside open() still subscribes") {
    val out = new Captured
    val fake = new FakeMqtt(connectInsideOpen = true)
    new MqttPump(fake, "broker", 1883, Seq("t"), None, out).connect()
    assert(fake.subscribed == Seq(Seq("t")))
    assert(out.statuses == Seq("CONNECTED"))
  }

  test("MQTT pump test probe: SUCCESS event, no subscribe, messages dropped") {
    val out = new Captured
    val fake = new FakeMqtt
    val pump = new MqttPump(fake, "broker", 1883, Seq("t"), None, out,
      beingTested = true)
    pump.connect()
    fake.fire(_.onConnect(fake.lastClient, 0))
    fake.fire(_.onMessage(fake.lastClient, "t", "m"))
    assert(pump.testCompleted)
    assert(out.testEvents == Seq(("SUCCESS", "Connection successful")))
    assert(fake.subscribed.isEmpty && out.frames.isEmpty && out.statuses.isEmpty)
  }

  // ------------------------------------------------------- TTN v2 (S2)

  private final class FakeHttp(loginOk: => Boolean,
                               tokens: Iterator[() => (String, Long)])
    extends HttpSession {
    var logins = 0
    var fetches = 0
    override def login(user: String, password: String): Boolean = {
      logins += 1; loginOk
    }
    override def fetchAccessToken(): (String, Long) = {
      fetches += 1; tokens.next()()
    }
  }

  private final class FakeWs extends WsConnector {
    @transient var callbacks: WsCallbacks = _
    @transient var lastSocket: WsClient = _
    @transient val sent = new ArrayBuffer[String]
    @transient var closes = 0
    @transient var opens = 0
    override def open(cb: WsCallbacks): WsClient = {
      opens += 1
      callbacks = cb
      lastSocket = new WsClient {
        override def send(text: String): Unit = sent += text
        override def close(): Unit = closes += 1
      }
      lastSocket
    }
    def fireOpen(): Unit = callbacks.onOpen(lastSocket)
    def fireMessage(raw: String): Unit = callbacks.onMessage(lastSocket, raw)
    def fireClose(sock: WsClient): Unit = callbacks.onClose(sock)
  }

  test("TTN v2: login failure → login error (test mode: ERROR event)") {
    val out = new Captured
    val s = new TtnV2Session(new FakeHttp(false, Iterator.empty), new FakeWs,
      "u", "p", "gw", out, () => 0L)
    s.connect()
    assert(out.loginErrors == 1 && s.isClosed)
    val out2 = new Captured
    val t = new TtnV2Session(new FakeHttp(false, Iterator.empty), new FakeWs,
      "u", "p", "gw", out2, () => 0L, beingTested = true)
    t.connect()
    assert(out2.testEvents == Seq(("ERROR", "Login failed")) && out2.loginErrors == 0)
  }

  test("TTN v2: open sends gateway+token frames; refresh 15 min before expiry") {
    val out = new Captured
    var now = 0L
    val http = new FakeHttp(true, Iterator(
      () => ("tok1", 3600000L), // expires at t=1h
      () => ("tok2", 7200000L)))
    val ws = new FakeWs
    val s = new TtnV2Session(http, ws, "u", "p", "eui-gw1", out, () => now)
    s.connect()
    ws.fireOpen()
    assert(ws.sent.toSeq == Seq("[\"gateway:eui-gw1\"]", "[\"token:tok1\"]"))
    assert(out.statuses == Seq("CONNECTED", "CONNECTED")) // login + open
    now = 3600000L - 900001L
    s.tick() // 1 ms before the refresh window opens
    assert(http.fetches == 1)
    now = 3600000L - 900000L
    s.tick() // due: expiry − 15 min
    assert(http.fetches == 2)
    assert(ws.sent.last == "[\"token:tok2\"]")
  }

  test("TTN v2: 3 consecutive refresh failures close the socket and re-login") {
    val out = new Captured
    val boom: () => (String, Long) = () => throw new RuntimeException("503")
    val http = new FakeHttp(true, Iterator(
      () => ("tok1", 1000L), boom, boom, boom, () => ("tok9", 999999999L)))
    val ws = new FakeWs
    val s = new TtnV2Session(http, ws, "u", "p", "gw", out, () => 5000L)
    s.connect()
    ws.fireOpen()
    s.tick(); s.tick() // two failures: retry, still open
    assert(ws.closes == 0 && http.logins == 1)
    s.tick() // third: close + full reconnect (re-login + new token + new ws)
    assert(ws.closes == 1)
    assert(http.logins == 2 && http.fetches == 5)
    assert(ws.opens == 2 && !s.isClosed)
  }

  test("TTN v2: stale socket's async onClose cannot wedge the reconnected session") {
    val out = new Captured
    val http = new FakeHttp(true, Iterator.continually(() => ("tok", 999999999L)))
    val ws = new FakeWs
    val s = new TtnV2Session(http, ws, "u", "p", "gw", out, () => 0L)
    s.connect()
    ws.fireOpen()
    val oldSocket = ws.lastSocket
    ws.fireMessage("""c[200,"disconnected"]""") // → reconnect (new socket)
    assert(ws.opens == 2 && !s.isClosed)
    ws.fireClose(oldSocket) // the OLD socket's close arrives late
    assert(!s.isClosed) // session still alive — refresh keeps running
    ws.fireClose(ws.lastSocket) // the CURRENT socket's close DOES end it
    assert(s.isClosed)
  }

  test("TTN v2: connect is idempotent; a token-fetch failure reports DISCONNECTED") {
    val out = new Captured
    val http = new FakeHttp(true, Iterator.continually(() => ("tok", 999999999L)))
    val ws = new FakeWs
    val s = new TtnV2Session(http, ws, "u", "p", "gw", out, () => 0L)
    s.connect()
    s.connect() // live session: no second socket, no double-logged frames
    assert(ws.opens == 1 && http.logins == 1)
    // token endpoint down on initial connect: status must not stick at
    // CONNECTED for a dead transport; the session stays closed/retryable
    val out2 = new Captured
    val boom: () => (String, Long) = () => throw new RuntimeException("503")
    val s2 = new TtnV2Session(new FakeHttp(true, Iterator(boom)), new FakeWs,
      "u", "p", "gw", out2, () => 0L)
    s2.connect()
    assert(out2.statuses == Seq("CONNECTED", "DISCONNECTED") && s2.isClosed)
  }

  test("TTN v2: [200,\"disconnected\"] frame is persisted AND reconnects") {
    val out = new Captured
    val http = new FakeHttp(true, Iterator.continually(() => ("tok", 999999999L)))
    val ws = new FakeWs
    val s = new TtnV2Session(http, ws, "u", "p", "gw", out, () => 0L)
    s.connect()
    ws.fireOpen()
    ws.fireMessage("h") // keepalive: logged verbatim, filtered downstream
    // SockJS CLOSE frames are unescaped on the wire (c[code,"reason"]),
    // which is what the reference's substring check matches (:169)
    ws.fireMessage("""c[200,"disconnected"]""")
    assert(out.frames.map(_._2) ==
      Seq("h", """c[200,"disconnected"]""")) // both persisted (F0a/raw downstream)
    assert(ws.closes == 1 && ws.opens == 2 && http.logins == 2) // reconnected
  }

  // ------------------------------------------------------- TTN v3 (S3)

  private final class ScriptedSse(script: Iterator[SsePoll]) extends SseConnector {
    @transient var opens = 0
    @transient var closes = 0
    override def open(): SseAttempt = {
      opens += 1
      new SseAttempt {
        override def poll(): SsePoll = script.next()
        override def close(): Unit = closes += 1
      }
    }
  }

  test("TTN v3: happy path — connect, chunk framing, timeout restart") {
    val out = new Captured
    val sse = new ScriptedSse(Iterator(
      SseOpening, SseHttp(200),
      SseChunk("{\"result\":{}}\n\n"),
      SseChunk("rec1\n\nrec2\n\n"), // two records in one delivery
      SseIdle, SseTimeout, // periodic restart: close + reopen, no status
      SseOpening, SseHttp(200),
      SseChunk("rec3\n\n")))
    val pump = new TtnV3Pump(sse, out)
    pump.start()
    (1 to 9).foreach(_ => assert(pump.step()))
    assert(out.frames.map(_._2) == Seq("{\"result\":{}}", "rec1", "rec2", "rec3"))
    assert(sse.opens == 2 && sse.closes == 1)
    assert(out.statuses == Seq("CONNECTED", "CONNECTED"))
    assert(out.loginErrors == 0 && pump.running)
  }

  test("TTN v3: non-200 → DISCONNECTED + login error; curl error → DISCONNECTED") {
    val out = new Captured
    val pump = new TtnV3Pump(new ScriptedSse(Iterator(SseHttp(403))), out)
    pump.start()
    assert(!pump.step() && !pump.running)
    assert(out.statuses == Seq("DISCONNECTED") && out.loginErrors == 1)

    val out2 = new Captured
    val pump2 = new TtnV3Pump(
      new ScriptedSse(Iterator(SseHttp(200), SseError("recv failure"))), out2)
    pump2.start()
    assert(pump2.step() && !pump2.step())
    assert(out2.statuses == Seq("CONNECTED", "DISCONNECTED"))
    assert(out2.loginErrors == 0) // an established stream's error is not a login error

    val out3 = new Captured
    val pump3 = new TtnV3Pump(new ScriptedSse(Iterator(SseHttp(401))), out3,
      beingTested = true)
    pump3.start()
    pump3.step()
    assert(out3.testEvents == Seq(("ERROR", "Connection failed")))
    assert(out3.loginErrors == 0)
  }

  test("TTN v3: split records reassemble; partial never prefixes a restarted stream") {
    val out = new Captured
    val sse = new ScriptedSse(Iterator(
      SseHttp(200),
      SseChunk("{\"result\""), // record split across two deliveries
      SseChunk(":1}\n\nnext"),
      SseChunk("-rec\n\n"),
      SseChunk("dangling-partial"), // never terminated before the timeout
      SseTimeout,
      SseHttp(200),
      SseChunk("fresh\n\n")))
    val pump = new TtnV3Pump(sse, out)
    pump.start()
    (1 to 8).foreach(_ => assert(pump.step()))
    // split halves became ONE record; the dangling partial died with
    // its stream instead of prefixing "fresh"
    assert(out.frames.map(_._2) == Seq("{\"result\":1}", "next-rec", "fresh"))
  }

  test("TTN v3 test probe: SUCCESS emitted, chunks never reach the log") {
    val out = new Captured
    val pump = new TtnV3Pump(
      new ScriptedSse(Iterator(SseHttp(200), SseChunk("probe-traffic\n\n"))), out,
      beingTested = true)
    pump.start()
    pump.step(); pump.step()
    assert(out.testEvents == Seq(("SUCCESS", "Connection successful")))
    assert(out.frames.isEmpty) // probe records must not become real uplinks
  }

  test("TTN v3: manual disconnect closes the attempt cleanly") {
    val out = new Captured
    val sse = new ScriptedSse(Iterator(SseHttp(200), SseIdle, SseIdle))
    val pump = new TtnV3Pump(sse, out)
    pump.start()
    assert(pump.step())
    pump.manuallyDisconnected = true
    assert(!pump.step() && !pump.running && sse.closes == 1)
  }

  // ------------------------------------- segment log → engine integration

  test("pump frames land in MessageLogSource segments and normalize end-to-end") {
    implicit val s = spark
    val root = java.nio.file.Files.createTempDirectory("transport_log")
    val dir = root.resolve("segments")
    java.nio.file.Files.createDirectory(dir)
    var t = 1717240000000000L
    val writer = new SegmentLogWriter(dir, collectorId = 5L,
      organizationId = 2L, nowMicros = () => { t += 1000000L; t },
      framesPerSegment = 2)
    val out = new Captured {
      override def frame(topic: Option[String], message: String): Unit =
        writer.append(topic, message)
    }
    val fake = new FakeMqtt
    val pump = new MqttPump(fake, "broker", 1883, Seq("gateway/#"), None, out)
    pump.connect()
    fake.fire(_.onConnect(fake.lastClient, 0))
    val up = graft.codec.Lorawan.b64encode(
      Array(0x40.toByte) ++ graft.codec.Lorawan.hexToLe("017fc1c4") ++
        Array(0x80.toByte) ++ Array(7.toByte, 0.toByte) ++
        Array(1.toByte) ++ Array(10.toByte, 20.toByte) ++
        graft.codec.Lorawan.hexToBytes("00000000"))
    val radio =
      s"""{"phyPayload":"$up","rxInfo":{"channel":1,"rfChain":0,"crcStatus":1,
         |"codeRate":"4/5","rssi":-60,"loRaSNR":9.0,"size":17,"timestamp":1,
         |"frequency":868100000,"mac":"aabb","dataRate":{"modulation":"LORA",
         |"spreadFactor":7,"bandwidth":125}}}""".stripMargin.replace("\n", "")
    fake.fire(_.onMessage(fake.lastClient, "gateway/gw1/rx", radio))
    fake.fire(_.onMessage(fake.lastClient, "gateway/gw1/rx", """{"rxInfo":{"rssi":-1}}""")) // → perr
    fake.fire(_.onMessage(fake.lastClient, "other/topic", "not json")) // → raw
    writer.flush()
    // two segments (framesPerSegment=2), names monotonic, seq increasing
    val segs = java.nio.file.Files.list(dir).toArray.map(_.toString).sorted
    assert(segs.length == 2)
    val df = spark.read.format("graft.sources.MessageLogSource")
      .load(dir.toString)
    assert(df.count() == 3)
    val recs = graft.streaming.Pipeline.toChirpRecs(df)
      .collect().sortBy(_.seq)
    assert(recs.map(_.route).toSeq == Seq("radio", "perr", "raw"))
    assert(recs.head.packet.get.dev_addr.contains("017fc1c4"))
    assert(recs.head.collectorId == 5L)
  }

  test("SegmentLogWriter restart resumes numbering — never overwrites a segment") {
    val root = java.nio.file.Files.createTempDirectory("transport_resume")
    val dir = root.resolve("segments")
    java.nio.file.Files.createDirectory(dir)
    val w1 = new SegmentLogWriter(dir, 1L, 1L, () => 1000L, framesPerSegment = 2)
    w1.append(Some("t"), "m0"); w1.append(Some("t"), "m1") // → seg 0
    w1.append(Some("t"), "m2"); w1.flush() // → seg 1
    // daemon restart: a NEW writer on the same directory must continue
    // after seg 1 / seq 2 — renumbering from zero would atomically
    // REPLACE seg 0, silently losing records a streaming offset already
    // passed
    val w2 = new SegmentLogWriter(dir, 1L, 1L, () => 2000L, framesPerSegment = 2)
    w2.append(Some("t"), "m3"); w2.flush() // → seg 2
    val names = MessageLogSource.listFiles(dir.toString)
      .map(f => new java.io.File(f).getName).toSeq
    assert(names == Seq("seg-000000000000.jsonl", "seg-000000000001.jsonl",
      "seg-000000000002.jsonl"))
    implicit val s = spark
    val df = spark.read.format("graft.sources.MessageLogSource").load(dir.toString)
    import org.apache.spark.sql.functions.col
    val rows = df.orderBy(col("seq")).select("seq", "message").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L)) // strictly increasing across the restart
    assert(rows.map(_.getString(1)).toSeq == Seq("m0", "m1", "m2", "m3"))
  }
}
