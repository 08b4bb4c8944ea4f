package graft.state

import graft.state.StateOps.{Envelope, LocState, Rec}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** F4 location take-once (TTN) on Spark 4's `transformWithState` —
  * same pure [[StateOps.locationStep]] kernel as
  * [[StateOps.locationFlatMap]]; state is cleared on consumption
  * (take-once, not sticky), here via `ValueState.clear()`. Completes the
  * stateful quartet (F1-F5) on the modern API. Host equality pinned by
  * ChirpProcessorSpec. */
class LocationProcessor extends StatefulProcessor[Long, Rec, Envelope] {

  @transient private var state: ValueState[LocState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[LocState](
      "loc", Encoders.product[LocState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Rec],
                               timers: TimerValues): Iterator[Envelope] = {
    val (st, envs) = StateOps.runOrdered(
      if (state.exists()) Some(state.get()) else None, rows)(StateOps.locationStep)
    st match {
      case Some(s) => state.update(s)
      case None    => state.clear()
    }
    envs.iterator
  }
}
