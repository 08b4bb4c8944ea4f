package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Control plane (SURVEY §3.1/§3.3): collector configs → running streaming
  * queries, lifecycle events, status-delta emission. The reference's
  * Orchestrator.py re-expressed as (a) pure, testable decision functions
  * and (b) a thin driver-side manager that starts/stops StreamingQueries.
  */
object Orchestrator {

  /** Collector config — the S4 REST bootstrap / S5 control-event payload
    * (Orchestrator.py:309-329, FIXTURES.md §2h). */
  final case class CollectorConfig(
      id: Long,
      ctype: String,            // chirpstack | ttn | ttn_v3 | generic_mqtt
      organizationId: Long,
      topics: Seq[String],
      gatewayIdCsv: String,     // TTN v2: comma-separated gateway ids
      gatewayName: String,
      enabled: Boolean,
      verified: Boolean)

  /** F9 fan-out: one TTN v2 config becomes one collector per gateway in
    * the CSV (Orchestrator.py:279-291). Pure. split limit -1: Java's
    * default split DROPS trailing empty entries ("gw1," → 1 collector,
    * "," → ZERO — the collector silently vanishes), where the
    * reference's Python str.split and fanOutDf's Spark split both keep
    * them — the typed event path and the bulk-bootstrap path must agree
    * on which collectors exist. */
  def fanOut(c: CollectorConfig): Seq[CollectorConfig] =
    if (c.ctype == "ttn" && c.gatewayIdCsv != null && c.gatewayIdCsv.nonEmpty)
      c.gatewayIdCsv.split(",", -1).toSeq.map(g =>
        c.copy(gatewayIdCsv = g, gatewayName = g))
    else Seq(c)

  /** Config DataFrame flavor of the fan-out (for bulk bootstrap).
    * Mirrors [[fanOut]] exactly — only `ttn` configs with a non-empty
    * CSV fan out (one row per gateway id); every other config passes
    * through as ONE row with `gateway_id` null. An unconditional
    * explode would disagree with the typed event path on which
    * collectors exist (e.g. a chirpstack row with a leftover CSV
    * becoming two collectors). Equivalence is pinned in
    * OrchestratorSpec. */
  def fanOutDf(configs: DataFrame): DataFrame = {
    val fanned = configs.withColumn("gateway_id",
      // explode_outer emits one null-valued row for a null array — the
      // pass-through case
      explode_outer(
        when(col("ctype") === "ttn" &&
            col("gateway_id_csv").isNotNull && col("gateway_id_csv") =!= "",
          split(col("gateway_id_csv"), ","))))
    // mirror the typed path's copy(gatewayIdCsv = g, gatewayName = g):
    // fanned rows must not keep the whole CSV in the per-collector
    // columns, or a consumer reading them labels collectors with 'a,b'
    val withCsv = fanned.withColumn("gateway_id_csv",
      coalesce(col("gateway_id"), col("gateway_id_csv")))
    if (withCsv.columns.contains("gateway_name"))
      withCsv.withColumn("gateway_name",
        coalesce(col("gateway_id"), col("gateway_name")))
    else withCsv
  }

  // ----------------------------------------------------------- F7 deltas

  final case class Status(connected: Boolean, verified: Boolean)
  final case class StatusEvent(collectorId: Long, status: String, verified: Boolean)

  /** F7 status-change detection: compare current statuses against the
    * cache, emit deltas only (Orchestrator.py:88-135). Pure.
    *
    * Reference-faithful contract, both edges:
    *  - unknown ids default to CONNECTED/unverified (`dict.get(id,
    *    'CONNECTED')` / `get(id, False)`, :104-105) — a brand-new
    *    collector that comes up connected emits NOTHING; only a new
    *    collector that is down (or already verified) is a delta;
    *  - a collector ABSENT from `current` (deleted / crashed out of
    *    the snapshot) emits nothing and its cache entry is KEPT (the
    *    reference dicts never forget, so a reappearance with the same
    *    last-seen status is silent). Downstream learns about removals
    *    from lifecycle Deleted events, not the status poll. */
  def statusDeltas(cache: Map[Long, Status],
                   current: Map[Long, Status]): (Map[Long, Status], Seq[StatusEvent]) = {
    val defaultStatus = Status(connected = true, verified = false)
    val events = current.toSeq.sortBy(_._1).flatMap { case (id, st) =>
      if (cache.getOrElse(id, defaultStatus) == st) Nil
      else Seq(StatusEvent(id,
        if (st.connected) "CONNECTED" else "DISCONNECTED", st.verified))
    }
    (cache ++ current, events)
  }

  /** Status-loop cadence (Orchestrator.py check_data_collectors_status):
    * one startup grace sleep — "wait until every collector is up after
    * deployment ... to avoid unstable logging in the frontend"
    * (`time.sleep(60*2)`, :90) — then a delta poll every 5 s
    * (`time.sleep(5)` at the END of each iteration, :135, so the FIRST
    * poll runs right after the grace, not grace+poll). */
  final val StatusStartupGraceMs: Long = 120000L
  final val StatusPollMs: Long = 5000L

  /** The k-th status poll (0-based) fires at start + grace + k·poll —
    * the schedule [[runStatusLoop]] sleeps through, exposed pure so the
    * cadence constants are pinned without a clock. */
  def statusPollDeadline(startMs: Long, tick: Long,
                         graceMs: Long = StatusStartupGraceMs,
                         pollMs: Long = StatusPollMs): Long =
    startMs + graceMs + tick * pollMs

  /** Per-collector transport-link view for the status loop's reconnect
    * scan (Orchestrator.py:125-128). Only TTN v2 collectors carry a
    * directly-observable websocket; `hasSocket` mirrors the reference's
    * `collector.ws` null check (a collector whose connect() never got as
    * far as opening a socket is NOT retried by the poll — only one whose
    * socket existed and then closed). */
  final case class LinkView(isTtnV2: Boolean, hasSocket: Boolean,
                            socketClosed: Boolean, manuallyDisconnected: Boolean)

  /** The status poll's auto-reconnect predicate (Orchestrator.py:125-128):
    * `isinstance(collector, TTNCollector) and not collector
    * .manually_disconnected and collector.ws and collector.ws.is_closed`.
    * Pure, so the spec pins each conjunct without a transport. */
  def needsReconnect(l: LinkView): Boolean =
    l.isTtnV2 && l.hasSocket && l.socketClosed && !l.manuallyDisconnected

  /** Driver loop around [[statusDeltas]] (Orchestrator.py:88-135):
    * grace sleep, then per-tick snapshot → deltas → emit → reconnect
    * scan → poll sleep. `sleep` is injected so tests pin the schedule;
    * `ticks` bounds the reference's infinite loop. Fault contract
    * mirrors the reference: a throwing emit is the caught per-publish
    * error (:117-121) — the cache entry STILL updates (the dict
    * assignment sits outside the inner try), so a lost delta is lost
    * for good, not re-emitted; a throwing snapshot is the outer
    * `except` (:133) — the tick is skipped but the loop keeps its
    * cadence.
    *
    * The reconnect scan is the reference's per-tick TTN v2 branch
    * (:125-128): every collector whose link reports ws-closed and NOT
    * manually disconnected gets `reconnect(id)` — wired by the host to
    * the TtnV2Session's idempotent connect(). A throwing reconnect is
    * the outer except too (the reference wraps connect() in no inner
    * try): it aborts the REMAINING reconnects of that tick but keeps the
    * loop cadence. One documented divergence: the reference interleaves
    * the reconnect check with delta publishing per collector, so a
    * throwing connect also suppresses LATER collectors' deltas for that
    * tick; this loop batches all deltas first (they ride one snapshot),
    * so deltas never wait on a faulting transport — strictly less loss,
    * same steady state. */
  def runStatusLoop(snapshot: () => Map[Long, Status])
                   (emit: StatusEvent => Unit,
                    links: () => Map[Long, LinkView] = () => Map.empty,
                    reconnect: Long => Unit = _ => ())
                   (sleep: Long => Unit, ticks: Long,
                    graceMs: Long = StatusStartupGraceMs,
                    pollMs: Long = StatusPollMs): Map[Long, Status] = {
    sleep(graceMs)
    var cache = Map.empty[Long, Status]
    var k = 0L
    while (k < ticks) {
      try {
        val (next, events) = statusDeltas(cache, snapshot())
        events.foreach { e =>
          try emit(e)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        cache = next
        links().toSeq.sortBy(_._1).foreach { case (id, l) =>
          if (needsReconnect(l)) reconnect(id)
        }
      } catch { case scala.util.control.NonFatal(_) => () }
      sleep(pollMs)
      k += 1
    }
    cache
  }

  // ------------------------------------------------- F5 timeout (driver)

  /** The 600 s verification timer (BaseCollector.py:26,43-53): collectors
    * still unverified past the deadline are disabled with FAILED_VERIFY.
    * Pure decision function; the driver calls it on a clock tick. */
  def verifyTimeouts(nowMs: Long, startedMs: Map[Long, Long],
                     verified: Set[Long], timeoutMs: Long = 600000L): Seq[Long] =
    startedMs.toSeq.sortBy(_._1).collect {
      case (id, t0) if !verified.contains(id) && nowMs - t0 >= timeoutMs => id
    }

  // --------------------------------------------------- F9 lifecycle core

  sealed trait Event { def id: Long }
  final case class Created(id: Long, config: CollectorConfig) extends Event
  final case class Deleted(id: Long) extends Event
  final case class Enabled(id: Long) extends Event
  final case class Disabled(id: Long) extends Event
  final case class Updated(id: Long, config: CollectorConfig) extends Event
  final case class FailedVerify(id: Long) extends Event

  final case class Plan(start: Seq[CollectorConfig], stop: Seq[Long])

  /** F9 lifecycle decisions (Orchestrator.py:138-243) as a pure function
    * from (running set, event) to start/stop actions. */
  def lifecycle(running: Map[Long, CollectorConfig], ev: Event): Plan = ev match {
    case Created(_, c) if c.enabled => Plan(fanOut(c), Nil)
    case Created(_, _)              => Plan(Nil, Nil)
    case Deleted(id)                => Plan(Nil, if (running.contains(id)) Seq(id) else Nil)
    case Enabled(id)                => Plan(Nil, Nil) // driver re-creates from config store
    case Disabled(id)               => Plan(Nil, if (running.contains(id)) Seq(id) else Nil)
    case Updated(id, c) =>
      Plan(if (c.enabled) fanOut(c) else Nil, if (running.contains(id)) Seq(id) else Nil)
    case FailedVerify(id)           => Plan(Nil, if (running.contains(id)) Seq(id) else Nil)
  }

  /** F10 test-connection probe (BaseCollector.py:65-83): start the
    * collector's query, wait up to `timeoutMs` for first progress
    * (= source reachable and producing batches), then stop. Returns
    * SUCCESS/ERROR as a boolean — the reference's 30 s probe window. */
  def testProbe(build: () => StreamingQuery, timeoutMs: Long = 30000L): Boolean =
    try {
      val q = build()
      try {
        val deadline = System.currentTimeMillis() + timeoutMs
        var ok = false
        while (!ok && System.currentTimeMillis() < deadline) {
          ok = q.lastProgress != null
          if (!ok) Thread.sleep(50)
        }
        ok
      } finally q.stop()
    } catch {
      // the poll sleeps: an interrupt lands here as InterruptedException —
      // report ERROR but re-set the flag so the caller sees its own
      // cancellation (swallowing it would clear the interrupt status)
      case _: InterruptedException => Thread.currentThread().interrupt(); false
      case scala.util.control.NonFatal(_) => false
    }

  /** Driver-side manager: applies [[lifecycle]] plans to real
    * StreamingQueries. `build` is the per-collector query factory
    * (source → pipeline → sink).
    *
    * CONTRACT on `build`: each invocation must allocate a FRESH
    * checkpoint location (generation-scoped, not config-derived). The
    * manager builds a replacement generation BEFORE stopping the one
    * it replaces (so a build failure rolls back cleanly), which means
    * the two generations briefly overlap: with a shared checkpoint,
    * Spark's stopActiveRunOnRestart would silently kill the old run
    * mid-build — and a rollback would then leave a dead query
    * registered as running. With fresh checkpoints the overlap is
    * plain at-least-once double-delivery for the build window, which
    * the K1 idempotency key absorbs at the consumer (the same
    * adjudication as every other at-least-once edge in this engine). */
  final class QueryManager(build: CollectorConfig => StreamingQuery) {
    private var running: Map[Long, (CollectorConfig, Seq[StreamingQuery])] = Map.empty

    // Guarded stop shared by every stop path: NonFatal faults are
    // swallowed (one dying query must not abort the rest of the plan),
    // but an InterruptedException re-sets the thread's interrupt flag —
    // a bare `case _: Exception` here would silently CLEAR it, leaving
    // the caller (e.g. an executor-service shutdown interrupting plan
    // application) unable to observe its own cancellation.
    private def quietStop(q: StreamingQuery): Unit =
      try q.stop() catch {
        case _: InterruptedException => Thread.currentThread().interrupt()
        case scala.util.control.NonFatal(_) => ()
      }

    def runningIds: Set[Long] = running.keySet

    def handle(ev: Event): Unit = synchronized {
      val plan = lifecycle(running.view.mapValues(_._1).toMap, ev)
      val restarted = plan.start.map(_.id).toSet
      // Pure stops only (Deleted, disabled): an id also in plan.start is
      // an Updated REPLACEMENT — its old generation must survive until
      // the new one has built (the class contract above), so its stop is
      // deferred to the pre-swap point below. Stopping it here, before
      // build(), is exactly the no-rollback failure the contract
      // forbids: a build() throw would leave the collector dark with
      // nothing registered. Each stop is guarded so one dying query
      // (stop() rethrows a terminal StreamingQueryException) cannot
      // abort the rest of the plan; the id deregisters either way — the
      // lifecycle decided it must not run.
      plan.stop.filterNot(restarted).foreach { id =>
        running.get(id).foreach(_._2.foreach(quietStop))
        running -= id
      }
      plan.start.groupBy(_.id).foreach { case (id, configs) =>
        // Build the replacement generation FIRST: if any build() throws,
        // the exception propagates with the previous generation still
        // running and still correctly recorded in the map — stopping
        // first and then failing to build would leave stopped queries
        // registered as running (and the collector dark). build() START
        // queries as it goes, so a mid-batch failure must stop the
        // ones already started before rethrowing — otherwise they run
        // orphaned (never registered, unreachable by stopAll,
        // double-writing beside the surviving old generation).
        val built = Vector.newBuilder[StreamingQuery]
        try configs.foreach(c => built += build(c))
        catch { case e: Throwable =>
          built.result().foreach(quietStop)
          throw e
        }
        val builtQueries = built.result()
        // Stop whatever this id previously ran — the deferred Updated
        // stop, or the old generation of a duplicate Created (the
        // control bus is at-least-once; overwriting the map entry
        // without stopping would orphan live queries: still consuming,
        // double-writing, unreachable by stopAll). Guarded: a throwing
        // stop() must not abort BEFORE the swap, or it is the freshly
        // built generation that ends up orphaned instead.
        running.get(id).foreach(_._2.foreach(quietStop))
        running += id -> (configs.head, builtQueries)
      }
    }

    def stopAll(): Unit = synchronized {
      // guarded like every other stop path: one dying query must not
      // prevent the rest of the fleet from stopping
      running.values.foreach(_._2.foreach(quietStop))
      running = Map.empty
    }
  }
}
