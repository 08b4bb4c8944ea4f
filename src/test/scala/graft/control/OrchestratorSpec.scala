package graft.control

import Orchestrator._

/** Pure-function tests for the control plane (Orchestrator.py
  * semantics), plus the DataFrame fan-out's equivalence pin (the one
  * test here that needs a session). */
class OrchestratorSpec extends graft.SparkSuite {

  private def cfg(id: Long, ctype: String = "chirpstack", csv: String = "",
                  enabled: Boolean = true) =
    CollectorConfig(id, ctype, 1L, Seq("#"), csv, "gw", enabled, verified = false)

  test("F9 TTN v2 fan-out: one collector per CSV gateway (Orchestrator.py:279-291)") {
    val out = fanOut(cfg(1, "ttn", "eui-a,eui-b,eui-c"))
    assert(out.map(_.gatewayIdCsv) == Seq("eui-a", "eui-b", "eui-c"))
    assert(fanOut(cfg(2, "chirpstack", "x,y")).size == 1) // only ttn fans out
    // trailing empties survive, matching Python str.split and fanOutDf —
    // Java's default split would make the "," collector silently vanish
    assert(fanOut(cfg(3, "ttn", "eui-a,")).map(_.gatewayIdCsv) == Seq("eui-a", ""))
    assert(fanOut(cfg(4, "ttn", ",")).map(_.gatewayIdCsv) == Seq("", ""))
  }

  test("F9 fanOutDf agrees with the typed fanOut on a mixed config set") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val configs = Seq(
      cfg(1, "ttn", "eui-a,eui-b,eui-c"),
      cfg(2, "chirpstack", "x,y"), // leftover CSV must NOT fan out
      cfg(3, "ttn", ""),           // empty CSV: pass through, not one '' gateway
      cfg(4, "ttn", null),
      cfg(5, "ttn", "eui-a,"))     // trailing empty: BOTH paths keep it
    val df = Seq(
      (1L, "ttn", "eui-a,eui-b,eui-c", "gw"),
      (2L, "chirpstack", "x,y", "gw"),
      (3L, "ttn", "", "gw"),
      (4L, "ttn", null.asInstanceOf[String], "gw"),
      (5L, "ttn", "eui-a,", "gw"))
      .toDF("id", "ctype", "gateway_id_csv", "gateway_name")
    val got = fanOutDf(df)
      .select(col("id"), col("gateway_id"), col("gateway_id_csv"),
        col("gateway_name"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)),
        r.getString(3))).toSeq.sorted
    // the typed path is the contract: fanned rows rewrite BOTH the csv
    // and the name to the single gateway (c.copy(gatewayIdCsv = g,
    // gatewayName = g)); pass-through rows keep their columns
    val expected = configs.flatMap { c =>
      val fanned = fanOut(c)
      if (fanned == Seq(c))
        Seq((c.id, None, Option(c.gatewayIdCsv), c.gatewayName))
      else fanned.map(f =>
        (c.id, Some(f.gatewayIdCsv), Some(f.gatewayIdCsv), f.gatewayName))
    }.sorted
    assert(got == expected)
  }

  test("F9 lifecycle decisions (Orchestrator.py:138-243)") {
    val running = Map(1L -> cfg(1))
    assert(lifecycle(running, Created(2, cfg(2))).start.map(_.id) == Seq(2))
    assert(lifecycle(running, Created(3, cfg(3, enabled = false))) == Plan(Nil, Nil))
    assert(lifecycle(running, Deleted(1)) == Plan(Nil, Seq(1)))
    assert(lifecycle(running, Deleted(9)) == Plan(Nil, Nil))
    assert(lifecycle(running, Disabled(1)) == Plan(Nil, Seq(1)))
    val up = lifecycle(running, Updated(1, cfg(1)))
    assert(up.stop == Seq(1) && up.start.map(_.id) == Seq(1)) // restart
    assert(lifecycle(running, FailedVerify(1)) == Plan(Nil, Seq(1)))
  }

  test("F7 status deltas: only transitions are emitted (Orchestrator.py:88-135)") {
    val cache = Map(1L -> Status(connected = true, verified = false),
      2L -> Status(connected = true, verified = true))
    val now = Map(1L -> Status(connected = true, verified = true), // changed
      2L -> Status(connected = true, verified = true),             // same
      3L -> Status(connected = false, verified = false))           // new
    val (cache2, events) = statusDeltas(cache, now)
    assert(events == Seq(
      StatusEvent(1, "CONNECTED", verified = true),
      StatusEvent(3, "DISCONNECTED", verified = false)))
    // second poll with no change emits nothing
    assert(statusDeltas(cache2, now)._2.isEmpty)
    // reference edge 1 (:104-105 defaults): a NEW collector that comes
    // up connected+unverified matches the dict defaults — silent
    assert(statusDeltas(Map.empty,
      Map(9L -> Status(connected = true, verified = false)))._2.isEmpty)
    // reference edge 2 (dicts never forget): a collector absent from
    // the snapshot emits nothing, stays cached, and a reappearance
    // with its last-seen status is silent
    val (cache3, ev3) = statusDeltas(cache2, now - 3L)
    assert(ev3.isEmpty && cache3.contains(3L))
    assert(statusDeltas(cache3, now)._2.isEmpty)
  }

  test("F7 status loop cadence: 120 s startup grace, then one poll per 5 s (Orchestrator.py:90,135)") {
    // the pure schedule carries the reference constants
    assert(statusPollDeadline(1000L, 0) == 1000L + 120000L)
    assert(statusPollDeadline(1000L, 3) == 1000L + 120000L + 3 * 5000L)

    // the loop sleeps exactly that schedule: grace first, poll after
    // every tick (sleep at the END of the iteration, so the first
    // snapshot happens right after the grace)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[StatusEvent]
    val snaps = Iterator(
      Map(1L -> Status(connected = false, verified = false)), // delta (down)
      Map(1L -> Status(connected = false, verified = false)), // same — silent
      Map(1L -> Status(connected = true, verified = false)))  // delta (back up)
    val cache = runStatusLoop(() => snaps.next())(emitted += _)(sleeps += _, ticks = 3)
    assert(sleeps.toSeq == Seq(120000L, 5000L, 5000L, 5000L))
    assert(emitted.toSeq == Seq(
      StatusEvent(1, "DISCONNECTED", verified = false),
      StatusEvent(1, "CONNECTED", verified = false)))
    assert(cache == Map(1L -> Status(connected = true, verified = false)))

    // fault contract: a throwing emit is the reference's caught publish
    // error — the cache entry still updates, so the delta is lost for
    // good (NOT re-emitted next tick); a throwing snapshot skips the
    // tick but keeps the cadence
    val sleeps2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    var emits = 0
    val snaps2 = Iterator(
      () => Map(1L -> Status(connected = false, verified = false)), // emit throws
      () => throw new RuntimeException("snapshot down"),            // tick skipped
      () => Map(1L -> Status(connected = false, verified = false))) // cached — silent
    val cache2 = runStatusLoop(() => snaps2.next()())(
      _ => { emits += 1; throw new RuntimeException("publish down") })(
      sleeps2 += _, ticks = 3)
    assert(emits == 1) // the lost delta never retried
    assert(sleeps2.toSeq == Seq(120000L, 5000L, 5000L, 5000L))
    assert(cache2 == Map(1L -> Status(connected = false, verified = false)))
  }

  test("F7 status loop auto-reconnect: ws-closed TTN v2 retried per tick, manual disconnect left alone (Orchestrator.py:125-128)") {
    // the pure predicate, conjunct by conjunct: TTNCollector instance,
    // ws non-null, ws.is_closed, not manually_disconnected
    val hit = LinkView(isTtnV2 = true, hasSocket = true,
      socketClosed = true, manuallyDisconnected = false)
    assert(needsReconnect(hit))
    assert(!needsReconnect(hit.copy(isTtnV2 = false)))           // chirpstack/v3: never
    assert(!needsReconnect(hit.copy(hasSocket = false)))         // ws is None: never
    assert(!needsReconnect(hit.copy(socketClosed = false)))      // live socket: left alone
    assert(!needsReconnect(hit.copy(manuallyDisconnected = true))) // user said stop: honored

    // in the loop: the closed+auto collector is retried on EVERY tick
    // while it stays closed; the manually-disconnected one never is
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val links = Map(
      1L -> hit,
      2L -> hit.copy(manuallyDisconnected = true),
      3L -> hit.copy(socketClosed = false))
    runStatusLoop(() => Map.empty)(_ => (), () => links, attempts += _)(
      _ => (), ticks = 2)
    assert(attempts.toSeq == Seq(1L, 1L))

    // fault contract: a throwing connect is the OUTER except (no inner
    // try in the reference) — remaining reconnects of the tick are
    // aborted, cadence keeps, deltas (batched before the scan) were
    // already emitted
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val tried = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[StatusEvent]
    val twoDown = Map(1L -> hit, 2L -> hit)
    runStatusLoop(() => Map(9L -> Status(connected = false, verified = false)))(
      emitted += _, () => twoDown,
      id => { tried += id; if (id == 1L) throw new RuntimeException("connect down") })(
      sleeps += _, ticks = 2)
    assert(tried.toSeq == Seq(1L, 1L)) // id 2 never reached, both ticks
    assert(sleeps.toSeq == Seq(120000L, 5000L, 5000L))
    assert(emitted.toSeq == Seq(StatusEvent(9, "DISCONNECTED", verified = false)))
  }

  test("F7 auto-reconnect wired to the TtnV2Session machine: poll revives a server-dropped socket, connect() stays idempotent") {
    import graft.sources.Transports._
    // minimal transport fakes (TransportsSpec owns the exhaustive ones)
    val http = new HttpSession {
      override def login(u: String, p: String): Boolean = true
      override def fetchAccessToken(): (String, Long) = ("tok", Long.MaxValue)
    }
    var opens = 0
    var lastCb: WsCallbacks = null
    var lastSock: WsClient = null
    val wsc = new WsConnector {
      override def open(cb: WsCallbacks): WsClient = {
        opens += 1; lastCb = cb
        lastSock = new WsClient {
          override def send(text: String): Unit = ()
          override def close(): Unit = ()
        }
        lastSock
      }
    }
    val out = new TransportOutput {
      override def frame(topic: Option[String], message: String): Unit = ()
      override def status(value: String): Unit = ()
      override def loginError(): Unit = ()
      override def testEvent(kind: String, message: String): Unit = ()
    }
    val s = new TtnV2Session(http, wsc, "u", "p", "gw", out, () => 0L)
    s.connect()
    assert(!s.isClosed && opens == 1)
    var manual = false
    def link() = Map(1L -> LinkView(isTtnV2 = true, hasSocket = opens > 0,
      socketClosed = s.isClosed, manuallyDisconnected = manual))

    // a tick over a LIVE session is a no-op (connect() idempotence
    // would also protect it, but the predicate never fires)
    runStatusLoop(() => Map.empty)(_ => (), link _, _ => s.connect())(
      _ => (), ticks = 1)
    assert(opens == 1)

    // server drops the socket → next poll tick reconnects it
    lastCb.onClose(lastSock)
    assert(s.isClosed)
    runStatusLoop(() => Map.empty)(_ => (), link _, _ => s.connect())(
      _ => (), ticks = 1)
    assert(!s.isClosed && opens == 2)

    // user disconnect: the session closes and the poll honors it forever
    s.disconnect(); manual = true
    runStatusLoop(() => Map.empty)(_ => (), link _, _ => s.connect())(
      _ => (), ticks = 3)
    assert(s.isClosed && opens == 2)
  }

  /** Minimal StreamingQuery stub recording stop() — QueryManager only
    * ever calls stop on the queries it builds. */
  private class StubQuery extends org.apache.spark.sql.streaming.StreamingQuery {
    @volatile var stopped = false
    override def stop(): Unit = stopped = true
    override def name: String = "stub"
    override def id: java.util.UUID = java.util.UUID.randomUUID()
    override def runId: java.util.UUID = java.util.UUID.randomUUID()
    override def sparkSession: org.apache.spark.sql.SparkSession = spark
    override def isActive: Boolean = !stopped
    override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
    override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = null
    override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = Array.empty
    override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress = null
    override def awaitTermination(): Unit = ()
    override def awaitTermination(timeoutMs: Long): Boolean = true
    override def processAllAvailable(): Unit = ()
    override def explain(): Unit = ()
    override def explain(extended: Boolean): Unit = ()
  }

  test("QueryManager: duplicate Created stops the old queries, never orphans them") {
    val built = scala.collection.mutable.ArrayBuffer.empty[StubQuery]
    val mgr = new QueryManager(_ => { val q = new StubQuery; built += q; q })
    mgr.handle(Created(1, cfg(1, "ttn", "a,b")))
    assert(mgr.runningIds == Set(1L) && built.size == 2) // fanned to 2 gateways
    // at-least-once control bus redelivers the Created
    mgr.handle(Created(1, cfg(1, "ttn", "a,b")))
    assert(mgr.runningIds == Set(1L) && built.size == 4)
    // the FIRST generation must be stopped, not orphaned double-writing
    assert(built.take(2).forall(_.stopped))
    assert(built.drop(2).forall(!_.stopped))
    // Deleted stops the live generation; stopAll covers the rest
    mgr.handle(Deleted(1))
    assert(mgr.runningIds.isEmpty && built.forall(_.stopped))
    mgr.handle(Created(2, cfg(2)))
    mgr.stopAll()
    assert(mgr.runningIds.isEmpty && built.forall(_.stopped))
  }

  test("QueryManager: build failure leaves the old generation running and stops partial builds") {
    val built = scala.collection.mutable.ArrayBuffer.empty[StubQuery]
    var failFrom = Int.MaxValue
    val mgr = new QueryManager(_ => {
      if (built.size >= failFrom) throw new RuntimeException("source unreachable")
      val q = new StubQuery; built += q; q
    })
    mgr.handle(Created(1, cfg(1, "ttn", "a,b")))
    assert(mgr.runningIds == Set(1L) && built.size == 2)
    // redelivered Created whose SECOND build throws: the first build of
    // the new generation must be stopped (not orphaned double-writing),
    // the old generation must keep running and stay registered
    failFrom = 3
    intercept[RuntimeException] {
      mgr.handle(Created(1, cfg(1, "ttn", "a,b")))
    }
    assert(mgr.runningIds == Set(1L))
    assert(built.take(2).forall(!_.stopped), "old generation was stopped")
    assert(built.size == 3 && built(2).stopped, "partial build left running")
    // the manager is still consistent: a later Deleted stops generation 1
    mgr.handle(Deleted(1))
    assert(mgr.runningIds.isEmpty && built.take(2).forall(_.stopped))
  }

  test("QueryManager: Updated build failure rolls back — old generation keeps running") {
    // Updated puts the id in BOTH plan.stop and plan.start; the stop is
    // the replacement's, so it must be deferred until the new generation
    // has built — stopping first would leave the collector dark with
    // nothing registered when build() throws
    val built = scala.collection.mutable.ArrayBuffer.empty[StubQuery]
    var fail = false
    val mgr = new QueryManager(_ => {
      if (fail) throw new RuntimeException("source unreachable")
      val q = new StubQuery; built += q; q
    })
    mgr.handle(Created(1, cfg(1, "ttn", "a,b")))
    assert(mgr.runningIds == Set(1L) && built.size == 2)
    fail = true
    intercept[RuntimeException] { mgr.handle(Updated(1, cfg(1, "ttn", "a,b"))) }
    assert(mgr.runningIds == Set(1L), "collector deregistered by a failed update")
    assert(built.forall(!_.stopped), "old generation stopped before the replacement built")
    // and the successful retry swaps generations cleanly
    fail = false
    mgr.handle(Updated(1, cfg(1, "ttn", "a,b")))
    assert(mgr.runningIds == Set(1L) && built.size == 4)
    assert(built.take(2).forall(_.stopped) && built.drop(2).forall(!_.stopped))
  }

  test("QueryManager: a throwing stop() neither orphans the new generation nor aborts the plan") {
    val built = scala.collection.mutable.ArrayBuffer.empty[StubQuery]
    val mgr = new QueryManager(_ => {
      // stop() rethrowing is real: a terminal StreamingQueryException
      // from a dying source surfaces through stop()
      val q = new StubQuery {
        override def stop(): Unit = { stopped = true; throw new RuntimeException("dying") }
      }
      built += q; q
    })
    mgr.handle(Created(1, cfg(1)))
    mgr.handle(Created(2, cfg(2)))
    // duplicate Created: the old generation's stop() throws mid-swap —
    // the fresh queries must still be registered (reachable by stopAll)
    mgr.handle(Created(1, cfg(1)))
    assert(mgr.runningIds == Set(1L, 2L) && built.size == 3)
    assert(built(0).stopped && !built(2).stopped)
    // Deleted for a dying query still deregisters and the plan survives
    mgr.handle(Deleted(1))
    assert(mgr.runningIds == Set(2L))
    mgr.stopAll()
    assert(mgr.runningIds.isEmpty)
  }

  test("F5 600 s verification timeout (BaseCollector.py:43-53)") {
    val started = Map(1L -> 0L, 2L -> 0L, 3L -> 500000L)
    assert(verifyTimeouts(600000L, started, verified = Set(2L)) == Seq(1L))
    assert(verifyTimeouts(1100000L, started, verified = Set(2L)) == Seq(1L, 3L))
    assert(verifyTimeouts(10000L, started, verified = Set.empty).isEmpty)
  }
}
