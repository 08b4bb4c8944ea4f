package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Salting preserves semantics; sketches stay within error bounds;
  * streaming dedup on the idempotency key makes the at-least-once sink
  * effectively exactly-once. */
class SkewSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("salted count/sum aggregation equals the plain aggregation") {
    val e = graft.Tables.events(spark, sf)
    val plain = e.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .orderBy(col("key")).collect()
    val salted = Skew.saltedCountSum(e, col("event_type"), col("value"), salts = 8)
      .orderBy(col("key")).collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(p.getLong(1) == s.getLong(1))
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6) // double merge order differs
    }
  }

  test("salted join equals the plain join") {
    val li = graft.Tables.lineitem(spark, sf)
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 4)
      .groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    assert(plain.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("salting a frame with a MAP column works (salt skips unhashable types)") {
    // xxhash64 rejects MapType — the salt must derive from the hashable
    // columns instead of throwing AnalysisException at the first parsed
    // props/tags map in the frame
    import spark.implicits._
    val df = Seq(("a", 1L, Map("k" -> "v")), ("a", 2L, Map("k" -> "w")),
        ("b", 3L, Map.empty[String, String]))
      .toDF("key", "value", "props")
    val out = Skew.saltedCountSum(df, col("key"), col("value"), salts = 4)
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 2L, 3L), ("b", 1L, 3L)))
  }

  test("approx_count_distinct (HLL) within declared error of exact") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("streaming dropDuplicates on the idempotency key dedups redelivery") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val deduped = stream.toDS().toDF("data_collector_id", "ts", "mic")
      .withColumn("key", sha2(concat_ws("|",
        col("data_collector_id"), col("ts"), col("mic")), 256))
      .dropDuplicates("key")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      stream.addData((1L, 100L, "aa"), (1L, 101L, "bb"))
      q.processAllAvailable()
      // redelivery of the same envelope (at-least-once source)
      stream.addData((1L, 100L, "aa"), (1L, 102L, "cc"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3) // duplicate suppressed
    } finally q.stop()
  }
}
