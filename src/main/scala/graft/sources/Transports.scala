package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Live-transport adapters in front of the [[MessageLogSource]] segment
  * log (SURVEY §2.1 S1-S3 — the r7 verdict's "What's missing" #1). The
  * zero-egress build ships no MQTT / WebSocket / HTTP client library, so
  * the SOCKET layer is a set of small traits the deployer implements
  * with the client of choice (paho-equivalent MQTT, any WebSocket
  * client, an SSE/HTTP streamer). Everything engine-side is real,
  * deterministic code — the collectors' lifecycle state machines
  * (connect / subscribe / reconnect / token refresh / status
  * transitions / test probes), the framing contracts, and the pump into
  * the immutable-segment log — spec-driven against scripted fakes in
  * TransportsSpec. Same adjudication shape as
  * [[graft.streaming.WireClients]] closed for the sink side (K1/K4).
  *
  * Reference lifecycles reproduced:
  *  - paho loop: GenericMqttCollector.py:67-93 connect guard +
  *    reconnect_delay_set(10, 60); LoraServerIOCollector.py:111-151
  *    credentials + connect_async; on_connect subscribe+CONNECTED
  *    (:502-512), on_disconnect rc!=0 → DISCONNECTED (:514-520), test
  *    probe SUCCESS-and-stop (:503-508).
  *  - TTN v2 WSS token dance: TTNCollector.py:86-126 login → access
  *    token → WebSocketApp; on_open sends the gateway and token
  *    subscribe frames (:290-301); schedule_refresh_token refreshes
  *    15 min before expiry and reconnects after 3 consecutive failures
  *    (:315-353); the server's [200,"disconnected"] frame triggers a
  *    transport reconnect while STILL being persisted downstream
  *    (:168-174 falls through to the message append).
  *  - TTN v3 SSE loop: TTNv3Collector.py:76-161 — status 0 wait,
  *    200 → CONNECTED (+ test SUCCESS), periodic 'Operation timed out'
  *    → silent stream restart, other curl error → DISCONNECTED + stop,
  *    non-200 → DISCONNECTED + login error (test: ERROR) + stop; the
  *    WRITEFUNCTION chunk contract strips the trailing blank line and
  *    splits multi-record chunks on '\n\n' (:68-73).
  */
object Transports {

  /** Engine-side event sink for a transport pump. `frame` rows feed the
    * [[MessageLogSource]] segment log (via [[SegmentLogWriter]]);
    * `status` feeds F7 status-change detection
    * (graft.control.Orchestrator.statusDeltas); `loginError` is the
    * reference's save_login_error channel; `testEvent` the F10
    * notify_test_event channel. */
  trait TransportOutput {
    def frame(topic: Option[String], message: String): Unit
    def status(value: String): Unit
    def loginError(): Unit
    def testEvent(kind: String, message: String): Unit
  }

  // ------------------------------------------------- segment-log writer

  /** frame → the MessageLogSource WRITER CONTRACT: JSONL records
    * buffered per segment and published by ATOMIC RENAME from outside
    * the watched directory, with zero-padded monotonic segment names
    * and a strictly increasing `seq` (which is what makes the source's
    * file-count offsets exactly-once and its seq-based segment pruning
    * sound). `nowMicros` is injected so tests and replay tooling stay
    * deterministic.
    *
    * RESUME: construction scans the directory and continues numbering
    * after the last published segment (its name for `segNo`, its last
    * record for `seq`) — a restarted daemon must NEVER renumber from
    * zero, because Files.move replaces an existing target silently and
    * a streaming offset that already passed that file would lose the
    * original records without a trace. One writer per directory is the
    * deployer's obligation (concurrent writers would race the same
    * segment names; shard across directories/files instead, as the
    * source's scale note says). */
  final class SegmentLogWriter(dir: Path, collectorId: Long,
                               organizationId: Long, nowMicros: () => Long,
                               framesPerSegment: Int = 256) {
    require(framesPerSegment > 0, "framesPerSegment must be positive")
    private val mapper = new ObjectMapper
    private val buf = new ArrayBuffer[String]
    private var seq = 0L
    private var segNo = 0L
    // resume after the last published segment, if any
    MessageLogSource.listFiles(dir.toString).lastOption.foreach { last =>
      val name = new java.io.File(last).getName // seg-%012d.jsonl
      segNo = name.stripPrefix("seg-").stripSuffix(".jsonl").toLong + 1
      val lines = Files.readAllLines(java.nio.file.Paths.get(last))
      lines.toArray(Array.empty[String]).reverseIterator.find(_.nonEmpty)
        .foreach(l => seq = mapper.readTree(l).get("seq").asLong + 1)
    }

    def append(topic: Option[String], message: String): Unit = synchronized {
      val node = mapper.createObjectNode()
      topic match {
        case Some(t) => node.put("topic", t)
        case None => node.putNull("topic")
      }
      node.put("message", message)
      node.put("data_collector_id", collectorId)
      node.put("organization_id", organizationId)
      node.put("seq", seq)
      node.put("arrival_ts", nowMicros())
      buf += mapper.writeValueAsString(node)
      seq += 1
      if (buf.size >= framesPerSegment) flush()
    }

    /** Publish the buffered records as one immutable segment. */
    def flush(): Unit = synchronized {
      if (buf.nonEmpty) {
        val name = f"seg-$segNo%012d.jsonl"
        // write OUTSIDE the watched directory, then move in atomically
        // (the contract documented on MessageLogSource)
        val tmp = dir.getParent.resolve(s"$name.${dir.getFileName}.tmp")
        Files.write(tmp, buf.mkString("", "\n", "\n").getBytes("UTF-8"))
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        segNo += 1
        buf.clear()
      }
    }
  }

  // ---------------------------------------------------------- MQTT (S1)

  /** paho-shaped client surface. Implementations hold the socket and the
    * network loop; the pump holds the collector lifecycle. */
  trait MqttClient {
    def subscribe(topics: Seq[String]): Unit
    def disconnect(): Unit
  }

  /** Callbacks carry the client they fire on — the paho shape
    * (on_connect(client, …)). This is what keeps the pump safe when an
    * implementation connects synchronously inside open() (the callback
    * would otherwise race the pump's own field assignment) or when a
    * reconnect loop fires callbacks for a socket the pump has already
    * replaced. */
  trait MqttCallbacks {
    def onConnect(client: MqttClient, rc: Int): Unit
    def onMessage(client: MqttClient, topic: String, payload: String): Unit
    def onDisconnect(client: MqttClient, rc: Int): Unit
  }

  /** Connection factory — config only, serializable (the
    * [[graft.streaming.WireClients.AmqpConnector]] shape). `open` is
    * connect_async + loop_start: wire the callbacks and start
    * delivering; implementations should retry with backoff in
    * [minReconnectSecs, maxReconnectSecs] like paho's
    * reconnect_delay_set(10, 60). */
  trait MqttConnector extends Serializable {
    def open(host: String, port: Int, keepaliveSecs: Int,
             credentials: Option[(String, String)],
             callbacks: MqttCallbacks): MqttClient
    def minReconnectSecs: Int = 10
    def maxReconnectSecs: Int = 60
  }

  /** S1 collector lifecycle (GenericMqttCollector / LoraServerIO
    * shape): idempotent connect guard, subscribe-on-connect, status
    * transitions, F10 test probe. Messages are handed to the engine
    * verbatim — all decode/normalize/state runs downstream. */
  final class MqttPump(connector: MqttConnector, host: String, port: Int,
                       topics: Seq[String],
                       credentials: Option[(String, String)],
                       out: TransportOutput, beingTested: Boolean = false) {
    @volatile private var client: MqttClient = _
    @volatile private var testDone = false

    /** True once a test-mode probe has emitted its event (F10). */
    def testCompleted: Boolean = testDone

    def connect(): Unit = synchronized {
      if (client != null) return // 'Existing connection' (:67-68)
      client = connector.open(host, port, keepaliveSecs = 60, credentials,
        new MqttCallbacks {
          override def onConnect(c: MqttClient, rc: Int): Unit =
            if (beingTested) { // probe: emit + stop, never subscribe (:503-508)
              out.testEvent("SUCCESS", "Connection successful")
              testDone = true
            } else {
              c.subscribe(topics) // (:510-511) — on the callback's client
              out.status("CONNECTED")
            }
          override def onMessage(c: MqttClient, topic: String,
                                 payload: String): Unit =
            if (!beingTested) out.frame(Some(topic), payload) // (:229-230)
          override def onDisconnect(c: MqttClient, rc: Int): Unit =
            if (rc != 0) out.status("DISCONNECTED") // (:514-520)
        })
    }

    def disconnect(): Unit = synchronized {
      if (client != null) { client.disconnect(); client = null }
    }
  }

  // ------------------------------------------------------- TTN v2 (S2)

  /** The two HTTP legs of the v2 token dance. `login` is the account
    * POST (true iff 200, TTNCollector.py:303-309); `fetchAccessToken`
    * returns (access_token, expires-epoch-millis) and may throw —
    * failures drive the reconnect counter (:315-353). */
  trait HttpSession {
    def login(user: String, password: String): Boolean
    def fetchAccessToken(): (String, Long)
  }

  /** Callbacks carry the socket they fire on — the websocket-client
    * shape (on_message(ws, …), exactly what the reference's lambdas
    * receive). The session compares the callback's socket against its
    * CURRENT one, so an old socket's asynchronous onClose after a
    * reconnect cannot wedge the new session, and onOpen can subscribe
    * even when an implementation completes the handshake inside
    * open(). */
  trait WsCallbacks {
    def onOpen(ws: WsClient): Unit
    def onMessage(ws: WsClient, raw: String): Unit
    def onClose(ws: WsClient): Unit
  }

  trait WsClient {
    def send(text: String): Unit
    def close(): Unit
  }

  trait WsConnector extends Serializable {
    def open(callbacks: WsCallbacks): WsClient
  }

  /** S2 session state machine. Threads are replaced by an explicit
    * `tick()` the host calls periodically (the deterministic analog of
    * schedule_refresh_token's 30 s polling loop, :315-353): a refresh is
    * due 15 minutes before expiry; 3 consecutive fetch failures close
    * the socket and re-run the whole login dance. */
  final class TtnV2Session(http: HttpSession, wsc: WsConnector,
                           user: String, password: String, gatewayId: String,
                           out: TransportOutput, nowMillis: () => Long,
                           beingTested: Boolean = false) {
    private var ws: WsClient = _
    private var token: String = _
    private var expires: Option[Long] = None
    private var refreshFailures = 0
    @volatile private var closed = true

    def isClosed: Boolean = closed

    /** Idempotent like MqttPump.connect: a live session is left alone —
      * a second socket would double-log every frame under fresh seq
      * values, which no downstream dedup could repair. On a token-fetch
      * failure the session stays closed and F7 is told DISCONNECTED;
      * the host retries by calling connect() again (the reference
      * instead lets the fetch exception escape with `connected` stuck
      * at CONNECTED — robustness over crash-fidelity, documented). */
    def connect(): Unit = synchronized {
      if (!closed) return
      if (!http.login(user, password)) {
        if (beingTested) out.testEvent("ERROR", "Login failed") // (:122-123)
        else out.loginError() // (:125-126)
        return
      }
      out.status("CONNECTED") // (:89-91 — set right after login succeeds)
      val (tok, exp) =
        try http.fetchAccessToken()
        catch {
          case NonFatal(_) =>
            out.status("DISCONNECTED") // never report a dead transport up
            return
        }
      token = tok
      expires = Some(exp)
      refreshFailures = 0
      closed = false
      ws = wsc.open(new WsCallbacks {
        override def onOpen(sock: WsClient): Unit =
          if (beingTested) {
            out.testEvent("SUCCESS", "Connection successful") // (:292-295)
          } else {
            // send on the callback's OWN socket: an implementation may
            // complete the handshake inside open(), before the `ws`
            // field assignment
            sock.send("[\"gateway:" + gatewayId + "\"]") // (:297)
            sock.send("[\"token:" + token + "\"]") // (:298)
            out.status("CONNECTED") // (:299)
          }
        override def onMessage(sock: WsClient, raw: String): Unit =
          handleFrame(sock, raw)
        override def onClose(sock: WsClient): Unit =
          TtnV2Session.this.synchronized {
            // only the CURRENT socket's close ends the session — a
            // replaced socket's asynchronous close after a reconnect
            // must not wedge the new one (:285-288)
            if (sock eq ws) closed = true
          }
      })
    }

    def disconnect(): Unit = synchronized {
      if (ws != null) ws.close()
      closed = true
    }

    private def handleFrame(sock: WsClient, raw: String): Unit = synchronized {
      if (beingTested) return // (:161-162)
      // frames from a REPLACED socket still draining its queue are
      // dropped; ws == null means the handshake completed inside open()
      // and this is the current socket's first delivery
      if (ws != null && !(sock eq ws)) return
      // every frame goes to the engine log VERBATIM — keepalives ('h')
      // and control frames are downstream concerns (F0a, ttnV2Kind)
      out.frame(None, raw)
      // server-initiated disconnect: reconnect the transport; the frame
      // itself was persisted above — the reference's handler falls
      // through to the message append (:168-174)
      if (raw.contains("[200,\"disconnected\"]")) {
        sock.close()
        closed = true
        connect()
      }
    }

    /** Refresh step. Due when no valid expiry is held (a prior fetch
      * failed) or now ≥ expiry − 15 min (:321-329). On success the new
      * token is pushed down the open socket (:336-339); the 3rd
      * consecutive failure closes and reconnects (:341-350). A closed
      * session never refreshes — the host monitors isClosed and calls
      * connect(). */
    def tick(): Unit = synchronized {
      if (closed) return
      val due = expires.forall(e => nowMillis() >= e - 900000L)
      if (!due) return
      try {
        val (tok, exp) = http.fetchAccessToken()
        token = tok
        expires = Some(exp)
        refreshFailures = 0
        ws.send("[\"token:" + tok + "\"]")
      } catch {
        case NonFatal(_) =>
          expires = None // retry on next tick (:341-343)
          refreshFailures += 1
          if (refreshFailures >= 3) { // (:344-350)
            refreshFailures = 0
            ws.close()
            closed = true
            connect()
          }
      }
    }
  }

  // ------------------------------------------------------- TTN v3 (S3)

  /** One streaming attempt (one curl handle). `poll` is one
    * multi_curl.perform() observation; `close` releases the handle. */
  trait SseAttempt {
    def poll(): SsePoll
    def close(): Unit
  }

  trait SseConnector extends Serializable {
    def open(): SseAttempt
  }

  sealed trait SsePoll
  /** status 0 — connection not yet established (:115-116). */
  case object SseOpening extends SsePoll
  /** first non-zero HTTP status observed (:114,117,152). */
  final case class SseHttp(status: Int) extends SsePoll
  /** one WRITEFUNCTION delivery — ends with '\n\n' (:68-73). */
  final case class SseChunk(data: String) extends SsePoll
  /** connected, no new data, no error (errstr == ''). */
  case object SseIdle extends SsePoll
  /** curl 'Operation timed out' — the deliberate periodic restart (:141-145). */
  case object SseTimeout extends SsePoll
  /** any other curl error (:146-151). */
  final case class SseError(message: String) extends SsePoll

  /** S3 pump state machine; `step()` consumes one poll observation and
    * returns false once the stream has terminated (error, bad status,
    * or manual disconnect). */
  final class TtnV3Pump(connector: SseConnector, out: TransportOutput,
                        beingTested: Boolean = false) {
    private var attempt: SseAttempt = _
    private var stopped = false
    @volatile var manuallyDisconnected = false

    def running: Boolean = !stopped

    def start(): Unit = {
      attempt = connector.open()
      stopped = false
      carry = ""
    }

    def step(): Boolean = {
      if (stopped) return false
      if (manuallyDisconnected) { // (:128-132)
        attempt.close()
        stopped = true
        return false
      }
      attempt.poll() match {
        case SseOpening => true
        case SseHttp(200) =>
          if (beingTested) out.testEvent("SUCCESS", "Connection successful") // (:118-121)
          out.status("CONNECTED") // (:123 — set in test mode too)
          true
        case SseHttp(_) => // (:152-161)
          out.status("DISCONNECTED")
          if (beingTested) out.testEvent("ERROR", "Connection failed")
          else out.loginError()
          attempt.close()
          stopped = true
          false
        case SseChunk(data) =>
          onReceive(data)
          true
        case SseIdle => true
        case SseTimeout => // silent restart every STREAM_TIMEOUT (:141-145)
          attempt.close()
          attempt = connector.open()
          carry = "" // a dead stream's partial record never prefixes the new one
          true
        case SseError(_) => // (:146-151)
          out.status("DISCONNECTED")
          attempt.close()
          stopped = true
          false
      }
    }

    /** WRITEFUNCTION contract (:68-73): records are delimited by a
      * blank line; one engine frame per record. Unlike the reference —
      * whose on_receive does data[:-2] unconditionally and therefore
      * CORRUPTS a record split across two curl deliveries (both halves
      * become unparseable fragments) — deliveries are reassembled in a
      * carry buffer and only '\n\n'-terminated records are emitted:
      * identical behavior for boundary-aligned chunks, whole records
      * instead of fragment noise for split ones (robustness over
      * crash-fidelity, documented; an unterminated final record is
      * held, where the reference would emit its mangled prefix). An
      * EMPTY terminated record is still emitted — downstream it is a
      * parsing error (route perr), exactly as json.loads('') is in the
      * reference. Test-mode traffic never reaches the log: the
      * reference's message() returns before processing when
      * being_tested (TTNv3Collector.py:206-207). */
    private var carry = ""
    private def onReceive(data: String): Unit = {
      carry += data
      var idx = carry.indexOf("\n\n")
      while (idx >= 0) {
        val record = carry.substring(0, idx)
        carry = carry.substring(idx + 2)
        if (!beingTested) out.frame(None, record)
        idx = carry.indexOf("\n\n")
      }
    }
  }
}
