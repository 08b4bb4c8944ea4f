package graft.control

import org.scalatest.funsuite.AnyFunSuite
import Orchestrator._

/** Pure-function tests for the control plane (Orchestrator.py semantics). */
class OrchestratorSpec extends AnyFunSuite {

  private def cfg(id: Long, ctype: String = "chirpstack", csv: String = "",
                  enabled: Boolean = true) =
    CollectorConfig(id, ctype, 1L, Seq("#"), csv, "gw", enabled, verified = false)

  test("F9 TTN v2 fan-out: one collector per CSV gateway (Orchestrator.py:279-291)") {
    val out = fanOut(cfg(1, "ttn", "eui-a,eui-b,eui-c"))
    assert(out.map(_.gatewayIdCsv) == Seq("eui-a", "eui-b", "eui-c"))
    assert(fanOut(cfg(2, "chirpstack", "x,y")).size == 1) // only ttn fans out
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
  }

  test("F5 600 s verification timeout (BaseCollector.py:43-53)") {
    val started = Map(1L -> 0L, 2L -> 0L, 3L -> 500000L)
    assert(verifyTimeouts(600000L, started, verified = Set(2L)) == Seq(1L))
    assert(verifyTimeouts(1100000L, started, verified = Set(2L)) == Seq(1L, 3L))
    assert(verifyTimeouts(10000L, started, verified = Set.empty).isEmpty)
  }
}
