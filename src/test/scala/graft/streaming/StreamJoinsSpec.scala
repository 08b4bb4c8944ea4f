package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream interval join driven live over MemoryStream: in-window
  * matches, out-of-window exclusion, and the left-outer null emission
  * that only fires once the watermark proves absence. */
class StreamJoinsSpec extends SparkSuite {

  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")

  test("inner interval join: clicks within the 5-minute lookback match") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = StreamJoins.clickAttribution(
      clicks.toDS().toDF("click_ts", "click_user", "click_id"),
      purchases.toDS().toDF("purchase_ts", "purchase_user", "purchase_id"))
    val q = out.writeStream.format("memory").queryName("attr_inner")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: click at 10:00, purchase at 10:03 (in window) — matches.
      // user 2: click at 10:00, purchase at 10:09 (> 5 min) — no match.
      // user 3: purchase at 10:02 with a LATER click at 10:04 — no match
      // (attribution is backward-looking only).
      clicks.addData((ts(10, 0), 1L, 100L), (ts(10, 0), 2L, 200L),
        (ts(10, 4), 3L, 300L))
      purchases.addData((ts(10, 3), 1L, 1000L), (ts(10, 9), 2L, 2000L),
        (ts(10, 2), 3L, 3000L))
      q.processAllAvailable()
      val got = spark.table("attr_inner").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(got == Set((100L, 1000L)), got.toString)

      // two clicks in-window → both attribution rows for the purchase
      clicks.addData((ts(10, 10), 4L, 401L), (ts(10, 12), 4L, 402L))
      purchases.addData((ts(10, 14), 4L, 4000L))
      q.processAllAvailable()
      val u4 = spark.table("attr_inner").collect()
        .filter(_.getAs[Long]("purchase_user") == 4L)
        .map(_.getAs[Long]("click_id")).toSet
      assert(u4 == Set(401L, 402L), u4.toString)
    } finally q.stop()
  }

  test("left-outer: unmatched purchase emits nulls after the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = StreamJoins.clickAttribution(
      clicks.toDS().toDF("click_ts", "click_user", "click_id"),
      purchases.toDS().toDF("purchase_ts", "purchase_user", "purchase_id"),
      joinType = "leftOuter")
    val q = out.writeStream.format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(10, 0), 1L, 100L))
      purchases.addData((ts(10, 3), 1L, 1000L), (ts(10, 3), 9L, 9000L))
      q.processAllAvailable()
      // matched row emits immediately; the user-9 purchase must NOT have
      // its null row yet — absence is not provable before the watermark
      val early = spark.table("attr_outer").collect()
      assert(early.map(_.getAs[Long]("purchase_id")).toSet == Set(1000L),
        early.mkString(","))

      // push both watermarks far past 10:03 + horizon → null row emits
      clicks.addData((ts(11, 0), 50L, 500L))
      purchases.addData((ts(11, 0), 50L, 5000L))
      q.processAllAvailable()
      q.processAllAvailable()
      val u9 = spark.table("attr_outer").collect()
        .filter(_.getAs[Long]("purchase_id") == 9000L)
      assert(u9.length == 1, u9.mkString(","))
      assert(u9.head.isNullAt(u9.head.fieldIndex("click_id")), u9.head.toString)
    } finally q.stop()
  }
}
