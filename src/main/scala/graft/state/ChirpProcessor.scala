package graft.state

import graft.state.StateOps.{ChirpState, Envelope, Rec}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** The ChirpStack state machine (F1+F2+F3) on Spark 4's
  * `transformWithState` — the same pure [[StateOps.chirpStep]] kernel
  * and save() gate as [[StateOps.chirpFlatMap]], hosted on the modern
  * stateful API (RocksDB-backed ValueState, explicit state schema,
  * upgrade path to state TTL / timers without operator rewrite).
  * Output equality with the flatMapGroupsWithState host is pinned by
  * ChirpProcessorSpec over the mixed random-interleaving fixture. */
class ChirpProcessor extends StatefulProcessor[Long, Rec, Envelope] {

  @transient private var state: ValueState[ChirpState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ChirpState](
      "chirp", Encoders.product[ChirpState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Rec],
                               timers: TimerValues): Iterator[Envelope] = {
    val (st, envs) = StateOps.runOrdered(
      if (state.exists()) state.get() else ChirpState.empty, rows)(StateOps.chirpStep)
    state.update(st)
    // persistence gate, exactly as chirpFlatMap (PacketPersistence.py:28-31)
    envs.iterator.filter(_.messages.nonEmpty)
  }
}
