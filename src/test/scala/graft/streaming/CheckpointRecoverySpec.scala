package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Failure recovery: a stateful streaming query stopped mid-stream and
  * restarted from its checkpoint must keep its state — a duplicate
  * arriving after the restart is still a duplicate (no re-emission =
  * state recovered; no missing rows = offsets recovered). Sink is the
  * transactional FILE sink (its commit log is what makes the parquet
  * output exactly-once across restarts — the memory sink refuses
  * recovery outright). This is the effectively-exactly-once contract
  * the K1 sink docs claim, driven through a real kill/restart cycle. */
class CheckpointRecoverySpec extends SparkSuite {

  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")

  test("Trigger.AvailableNow drains the backlog and self-terminates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ckpt = java.nio.file.Files.createTempDirectory("an_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("an_sink").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    // backlog accumulated BEFORE the query exists — the nightly catch-up
    // shape: process everything queued, then stop on its own
    stream.addData((ts(9, 0), 1L, "alpha"), (ts(9, 1), 2L, "alpha"),
      (ts(9, 2), 3L, "beta"))
    val q = CorpusStream.dedupByContent(
        stream.toDS().toDF("ts", "doc_id", "text"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "query did not self-terminate")
    val texts = spark.read.parquet(outDir).collect()
      .map(_.getAs[String]("text")).toSet
    assert(texts == Set("alpha", "beta"), texts.toString)
  }

  /** The kill/restart cycle, parameterized over the state-store backend:
    * the same contract must hold on the default (HDFS-backed) provider
    * the local suites use AND on RocksDB, the provider a 1000-executor
    * deployment runs (SURVEY §4.3) — state larger than executor heap,
    * changelog-checkpointed. Provider choice is baked into the
    * checkpoint at first start, so it is set BEFORE incarnation 1 and
    * restored after. */
  private def restartCycle(provider: Option[String]): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    provider.foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
      val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
      def out = CorpusStream.dedupByContent(
        stream.toDS().toDF("ts", "doc_id", "text"))
      def start() = out.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      def sinkRows() = spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet

      // incarnation 1: two distinct docs pass
      val q1 = start()
      stream.addData((ts(10, 0), 1L, "alpha"), (ts(10, 1), 2L, "beta"))
      q1.processAllAvailable()
      assert(sinkRows() == Set((1L, "alpha"), (2L, "beta")), sinkRows().toString)
      q1.stop()

      // data arriving while the query is down: a replay of "alpha" (must
      // stay suppressed — only recovered state can know that) + new docs
      stream.addData((ts(10, 2), 3L, "alpha"), (ts(10, 3), 4L, "gamma"))

      // incarnation 2: same checkpoint, same sink
      val q2 = start()
      stream.addData((ts(10, 4), 5L, "delta"))
      q2.processAllAvailable()
      val resumed = sinkRows()
      q2.stop()

      // exactly-once across the restart: the replayed "alpha" is absent
      // (state recovered), the incarnation-1 rows appear exactly once
      // (offsets + sink log recovered), nothing new is lost
      assert(resumed == Set((1L, "alpha"), (2L, "beta"), (4L, "gamma"), (5L, "delta")),
        resumed.toString)
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("dedup state survives a stop/restart from checkpoint") {
    restartCycle(None)
  }

  test("dedup state survives a stop/restart on the RocksDB store") {
    restartCycle(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
  }

  test("tokenBudget admission counter survives a stop/restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ckpt = java.nio.file.Files.createTempDirectory("tb_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("tb_sink").toString
    val stream = MemoryStream[CorpusStream.BudgetDoc]
    def start() = CorpusStream.tokenBudget(stream.toDS(), budget = 100L)
      .toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    def rows() = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("tokens_before"), r.getAs[Boolean]("kept"))).toSet

    // incarnation 1: two 40-token docs fill the counter to 80
    val q1 = start()
    stream.addData(CorpusStream.BudgetDoc("a", 1L, 40L),
      CorpusStream.BudgetDoc("a", 2L, 40L))
    q1.processAllAvailable()
    assert(rows() == Set((1L, 0L, true), (2L, 40L, true)), rows().toString)
    q1.stop()

    // incarnation 2: the recovered counter (80) must carry the
    // admission decisions — doc 3 squeezes in under the 100 budget,
    // doc 4 is refused at 120, and a fresh source starts from zero.
    // Only the CHECKPOINTED long can know the 80.
    val q2 = start()
    stream.addData(CorpusStream.BudgetDoc("a", 3L, 40L),
      CorpusStream.BudgetDoc("a", 4L, 40L),
      CorpusStream.BudgetDoc("b", 5L, 40L))
    q2.processAllAvailable()
    q2.stop()
    assert(rows() == Set((1L, 0L, true), (2L, 40L, true),
      (3L, 80L, true), (4L, 120L, false), (5L, 0L, true)), rows().toString)
  }

  test("nearDupLsh first-claimant band state survives a stop/restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val base = "the quick brown fox jumps over a lazy dog while rain " +
      "falls on the quiet town and lights flicker in the distance tonight"
    val edited = base.replace("rain", "snow")
    val fresh = "entirely different words compose this other document " +
      "about ships and harbors and the long voyage across the cold sea"

    val ckpt = java.nio.file.Files.createTempDirectory("lsh_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("lsh_sink").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    def start() = CorpusStream.nearDupLsh(
        stream.toDS().toDF("ts", "doc_id", "text"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    // incarnation 1: the base doc claims its 32 band buckets
    val q1 = start()
    stream.addData((ts(10, 0), 1L, base))
    q1.processAllAvailable()
    q1.stop()

    // incarnation 2: a near-identical doc arrives post-restart; it can
    // only lose bands to the base doc if the band-claim state was
    // recovered from the checkpoint. A fresh doc still keeps all 32.
    // The 12:30 row just advances the watermark past the 10:00-11:00
    // window so the verdicts materialize in the append sink.
    val q2 = start()
    stream.addData((ts(10, 5), 2L, edited), (ts(10, 6), 3L, fresh))
    q2.processAllAvailable()
    stream.addData((ts(12, 30), 99L, "flush"))
    q2.processAllAvailable()
    q2.stop()

    val byId = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bands_kept"), r.getAs[Boolean]("near_dup"))).toMap
    assert(byId(1L) == (32L, false), byId.toString) // first claimant
    assert(byId(3L) == (32L, false), byId.toString) // fresh content
    val (editKept, editDup) = byId(2L)
    assert(editDup && editKept < 32L,
      s"edited doc kept $editKept bands — band state not recovered")
    assert(!byId.contains(99L)) // flush row's window never closed
  }
}
