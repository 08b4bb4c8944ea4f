package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the live twins of the batch q64 (as-of) and
  * q65 (range) joins: two unbounded inputs joined on a key plus an
  * event-time interval, the attribution join every event pipeline runs
  * in production (click → purchase within a lookback window).
  *
  * Scale notes (the state-store math that makes this viable on an
  * unbounded stream): Spark buffers BOTH sides in the state store and
  * uses the watermark + the time-interval predicate to evict — a click
  * older than `purchase watermark − lookback` can never match a future
  * purchase, so per-key state is bounded by horizon × arrival rate, not
  * stream length. Without the interval bound the join would be
  * unbounded-state and Spark rejects outer variants outright; WITH it,
  * inner joins emit as matches arrive and outer joins emit their
  * null-padded rows once the watermark proves no match can come. The
  * join shuffles both sides on the key — same partitioning story as the
  * batch shape, with RocksDB state instead of a sort. */
object StreamJoins {

  /** Click→purchase attribution: every purchase paired with each click
    * by the same user in `[purchase_ts − lookback, purchase_ts]`.
    *
    * Inputs carry disjoint column names (click_ts/click_user vs
    * purchase_ts/purchase_user) so the time-interval condition is
    * unambiguous for Spark's state eviction analysis.
    *
    * `joinType` "inner": matched pairs only, emitted as they arrive.
    * "leftOuter" (purchases left): unmatched purchases ALSO emit —
    * null click columns — but only after the click-side watermark
    * passes `purchase_ts`, the earliest moment absence is provable. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       lookback: String = "5 minutes",
                       horizon: String = "10 minutes",
                       joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", horizon)
    val p = purchases.withWatermark("purchase_ts", horizon)
    val cond = expr(
      s"""click_user = purchase_user AND
         |click_ts >= purchase_ts - interval $lookback AND
         |click_ts <= purchase_ts""".stripMargin)
    // both modes join purchase-side-left so the output column order is
    // identical whichever mode a caller picks (a positional consumer —
    // toDF rename, parquet append — must not re-order when the mode flips)
    joinType match {
      case "inner"     => p.join(c, cond)
      case "leftOuter" => p.join(c, cond, "leftOuter")
      case other => throw new IllegalArgumentException(
        s"unsupported joinType $other (inner | leftOuter)")
    }
  }
}
