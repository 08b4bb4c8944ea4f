package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus operators: exact dedup with bounded state and the
  * per-source windowed quota (streaming twins of q32/q44). */
class CorpusStreamSpec extends SparkSuite {

  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")

  test("streaming dedup: first copy passes, in-horizon duplicates drop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = CorpusStream.dedupByContent(
      stream.toDS().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // same text twice in one batch + once distinct → two survivors
      stream.addData((ts(10, 0), 1L, "alpha beta"), (ts(10, 1), 2L, "alpha beta"),
        (ts(10, 2), 3L, "gamma"))
      q.processAllAvailable()
      val first = spark.table("dedup_out").collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      assert(first.map(_._2) == Set("alpha beta", "gamma"))
      assert(first.map(_._1).contains(3L))

      // a replay in a later batch, still inside the horizon → suppressed
      stream.addData((ts(10, 3), 4L, "alpha beta"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // new content still passes
      stream.addData((ts(10, 4), 5L, "delta"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }

  test("streaming LSH near-dup: replay loses all bands, edit loses some, fresh keeps all") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val base = "the quick brown fox jumps over a lazy dog while rain " +
      "falls on the quiet town and lights flicker in the distance tonight"
    val edited = base.replace("rain", "snow")
    val fresh = "entirely different words compose this other document " +
      "about ships and harbors and the long voyage across the cold sea"

    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = CorpusStream.nearDupLsh(stream.toDS().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("lsh_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData((ts(10, 0), 1L, base))
      q.processAllAvailable()
      stream.addData((ts(10, 2), 2L, base),   // exact replay
        (ts(10, 4), 3L, edited),              // one-word edit
        (ts(10, 6), 4L, fresh))               // unrelated
      q.processAllAvailable()
      // close the hour-10 window
      stream.addData((ts(11, 30), 99L, fresh + " x"))
      q.processAllAvailable()
      val rows = spark.table("lsh_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(rows(1L) == ((32L, false)), rows.toString)   // first claimant keeps all
      assert(rows(2L) == ((0L, true)), rows.toString)     // replay loses every band
      val (keptEdited, dupEdited) = rows(3L)
      assert(dupEdited && keptEdited > 0 && keptEdited < 32, rows.toString)
      assert(rows(4L) == ((32L, false)), rows.toString)
    } finally q.stop()
  }

  test("nearDupLsh computes the MinHash kernel ONCE per row, not per band") {
    import spark.implicits._
    // the signature projection is referenced from inside the 33-element
    // band-explode lambda; if the optimizer ever starts substituting a
    // single-reference projection into a higher-order-function lambda,
    // the 128-perm kernel re-runs once PER BAND on the ingest hot path.
    // Verified not to happen on this Spark build (with or without a
    // barrier) — this pin exists so an optimizer change trips a spec
    // instead of silently 33x-ing the ingest CPU. lshBandRows is the
    // exact code path nearDupLsh streams through; the optimizer treats
    // the projection pattern identically on a batch frame, where the
    // plan is observable without a micro-batch.
    // parquet-backed, not a LocalRelation: ConvertToLocalRelation would
    // eagerly evaluate the kernel at optimization time and hide it
    val d = java.nio.file.Files.createTempDirectory("graft-lshpin").toString
    Seq((ts(10, 0), 1L, "alpha beta gamma delta epsilon"))
      .toDF("ts", "doc_id", "text").write.parquet(s"$d/docs.parquet")
    val docs = spark.read.parquet(s"$d/docs.parquet")
    val plan = CorpusStream.lshBandRows(docs).queryExecution.optimizedPlan.toString
    val kernelCount = "graft_minhash_sig".r.findAllIn(plan).length
    assert(kernelCount == 1,
      s"expected ONE minhash kernel in the optimized plan, found $kernelCount:\n$plan")
  }

  test("streaming source quota: closed windows emit counts with over-cap flag") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val out = CorpusStream.sourceQuota(
      stream.toDS().toDF("ts", "source"), cap = 2L)
    val q = out.writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour-10: srcA 3 docs (over cap 2), srcB 1 doc
      stream.addData((ts(10, 0), "srcA"), (ts(10, 10), "srcA"),
        (ts(10, 20), "srcA"), (ts(10, 30), "srcB"))
      q.processAllAvailable()
      assert(spark.table("quota_out").count() == 0) // window still open

      // advance the watermark past hour 10 → the window closes
      stream.addData((ts(11, 30), "srcC"))
      q.processAllAvailable()
      val rows = spark.table("quota_out").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
      assert(rows == Set(("srcA", 3L, true), ("srcB", 1L, false)))
    } finally q.stop()
  }

  test("streaming ANN lookup: stream probes == batch, twin vector is rank 1") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // deterministic corpus: 64 vectors spread over the 8-dim sphere via
    // an LCG; vec 7's direction also appears as the query "twin" probe
    def vec(seed: Long): Array[Float] = {
      var x = seed
      Array.fill(8) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt % 1000) / 500.0f - 1.0f
      }
    }
    val corpus = (0L until 64L).map(i => (i, vec(i + 1))).toDF("vec_id", "embedding")
    val queries = Seq(
      (ts(12, 0), 100L, vec(8)),                       // exact copy of vec 7
      (ts(12, 1), 101L, vec(8).map(_ * 2.0f)),         // scaled copy: same direction
      (ts(12, 30), 102L, vec(999)))                    // unrelated direction

    val stream = MemoryStream[(java.sql.Timestamp, Long, Array[Float])]
    // caller-owned cache: persist the index across micro-batches,
    // release it when the query is done (annLookup hides no cache)
    val index = CorpusStream.annIndex(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = CorpusStream.annLookup(
      stream.toDS().toDF("ts", "query_id", "embedding"), index, k = 3,
      window_ = "1 hour", horizon = "1 minute")
    val q = out.writeStream.format("memory").queryName("ann_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(queries.take(2): _*)
      q.processAllAvailable()
      stream.addData(queries.drop(2): _*)
      // sentinel far ahead closes the 12:00 window
      stream.addData((ts(15, 0), 999L, vec(5)))
      q.processAllAvailable()

      def key(df: org.apache.spark.sql.DataFrame) = df
        .filter(org.apache.spark.sql.functions.col("query_id") =!= 999L).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).toSet
      val streamed = key(spark.table("ann_out"))
      val batch = key(CorpusStream.annLookup(
        queries.toDF("ts", "query_id", "embedding"), corpus, k = 3,
        window_ = "1 hour", horizon = "1 minute"))
      assert(streamed == batch, s"stream $streamed vs batch $batch")

      // the exact and the scaled copy of vec 7 both retrieve it at rank 1
      // with cosine == 1 (same signature bucket, so LSH cannot miss it)
      val rank1 = streamed.filter(_._2 == 1L).map(t => t._1 -> (t._3, t._4)).toMap
      assert(rank1(100L)._1 == 7L && math.abs(rank1(100L)._2 - 1.0) < 1e-9, rank1.toString)
      assert(rank1(101L)._1 == 7L && math.abs(rank1(101L)._2 - 1.0) < 1e-9, rank1.toString)
      // every query got exactly k (or fewer) ranked rows, contiguous from 1
      queries.take(3).map(_._2).foreach { qid =>
        val ranks = streamed.filter(_._1 == qid).map(_._2).toSeq.sorted
        assert(ranks == (1L to ranks.length), s"$qid ranks $ranks")
      }
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming decontamination: benchmark-overlapping docs flag map-only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // benchmark: two eval prompts; contamination = any shared 4-gram
    val bench = Seq("the quick brown fox jumps over the lazy dog",
      "to be or not to be that is the question")
      .toDF("text")
    val docs = Seq(
      (ts(9, 0), 1L, "we saw the quick brown fox jumps away yesterday"), // hits
      (ts(9, 1), 2L, "completely unrelated training text with no overlap at all"),
      (ts(9, 2), 3L, "or not to be that is the question asked twice: " +
        "to be or not to be that is the question"), // many hits
      (ts(9, 3), 4L, "too short"))                  // < n words → 0 grams

    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = CorpusStream.decontaminate(
      stream.toDS().toDF("ts", "doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(docs.take(2): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(2): _*)
      q.processAllAvailable()

      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit_grams"),
          r.getAs[Boolean]("contaminated"))).toSet
      val streamed = key(spark.table("decon_out"))
      // map-only op: batch application of the same function must agree
      val batch = key(CorpusStream.decontaminate(
        docs.toDF("ts", "doc_id", "text"), bench))
      assert(streamed == batch, s"stream $streamed vs batch $batch")

      val byId = streamed.map(t => t._1 -> t).toMap
      assert(byId(1L)._3 && byId(1L)._2 >= 1)      // shared fox 4-grams
      assert(!byId(2L)._3 && byId(2L)._2 == 0)
      assert(byId(3L)._3 && byId(3L)._2 > byId(1L)._2) // near-verbatim copy
      assert(!byId(4L)._3)                          // no grams, no flag
    } finally q.stop()
  }

  test("streaming BPE encode: corpus replay == q106 bit-for-bit across a restart cycle (r15)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // the model learned ONCE from the corpus at rest — the stream twin
    // carries only the merge list, never the vocabulary
    val merges = graft.queries.TextOps.bpeLearnedMerges(spark, sf)
    assert(merges.length == 3 && merges.distinct.length == 3)
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (ts(8, 0), r.getLong(0), r.getString(1)))

    // file sink + checkpoint, stopped mid-corpus and restarted — the
    // tokenBudget/dedup restart discipline applied to the encode twin
    val ckpt = java.nio.file.Files.createTempDirectory("enc_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("enc_sink").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    def start() = CorpusStream.encode(
        stream.toDS().toDF("ts", "doc_id", "text"), merges)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    stream.addData(docs.take(docs.length / 2): _*)
    q1.processAllAvailable()
    q1.stop()
    // the second half arrives while the query is down; incarnation 2
    // resumes from the checkpoint and must not lose or duplicate rows
    stream.addData(docs.drop(docs.length / 2): _*)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("tokens"))).toSet
    // the ts column must survive onto every encoded row (watermarkable)
    assert(spark.read.parquet(outDir).columns.contains("ts"))
    val batch = graft.queries.TextOps.q106BpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming token budget: admission in arrival order, state crosses batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[CorpusStream.BudgetDoc]
    val out = CorpusStream.tokenBudget(stream.toDS(), budget = 100L)
    val q = out.writeStream.format("memory").queryName("budget_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: src-a fills 40+50=90 < 100, src-b takes one huge doc
      stream.addData(
        CorpusStream.BudgetDoc("a", 1L, 40L),
        CorpusStream.BudgetDoc("a", 2L, 50L),
        CorpusStream.BudgetDoc("b", 3L, 500L))
      q.processAllAvailable()
      // batch 2: src-a doc 4 still starts inside the budget (90 < 100),
      // doc 5 does not; src-b is already exhausted — state persisted
      stream.addData(
        CorpusStream.BudgetDoc("a", 4L, 30L),
        CorpusStream.BudgetDoc("a", 5L, 10L),
        CorpusStream.BudgetDoc("b", 6L, 5L))
      q.processAllAvailable()

      val rows = spark.table("budget_out").collect()
        .map(r => r.getLong(1) -> (r.getLong(3), r.getBoolean(4))).toMap
      assert(rows(1L) == (0L, true))
      assert(rows(2L) == (40L, true))
      assert(rows(3L) == (0L, true))    // first doc of a source always ships
      assert(rows(4L) == (90L, true))   // starts inside the budget
      assert(rows(5L) == (120L, false)) // budget exhausted mid-batch-2
      assert(rows(6L) == (500L, false)) // state crossed the batch boundary
    } finally q.stop()
  }

  test("streaming chunking: stream chunks == batch q94 on the real corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (ts(8, 0), r.getLong(0), r.getString(1)))

    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = CorpusStream.chunk(stream.toDS().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("chunk_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(docs.take(docs.length / 2): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(docs.length / 2): _*)
      q.processAllAvailable()

      val streamed = spark.table("chunk_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
          r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_len"),
          r.getAs[String]("chunk_md5"))).toSet
      // the ts column must survive onto every chunk row (watermarkable)
      assert(spark.table("chunk_out").columns.contains("ts"))
      val batch = graft.queries.TextOps.q94ChunkOverlap(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming classifier: stream scores == batch q101 on the real corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (ts(8, 0), r.getLong(0), r.getString(1)))

    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = CorpusStream.classify(stream.toDS().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("classify_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(docs.take(docs.length / 2): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(docs.length / 2): _*)
      q.processAllAvailable()

      val streamed = spark.table("classify_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("score"), r.getAs[Double]("mean_weight"),
          r.getAs[Boolean]("keep"))).toSet
      // the event-time column survives (downstream stages can watermark)
      assert(spark.table("classify_out").columns.contains("ts"))
      val batch = graft.queries.TextOps.q101QualityClassifier(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4))).toSet
      assert(streamed == batch)
      // both verdicts occur even at the smallest SF — the filter is live
      assert(streamed.exists(_._5) && streamed.exists(!_._5))
    } finally q.stop()
  }

  test("streaming LM score: corpus replay reproduces q93 bit-for-bit; unseen text scores") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    val corpus = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    val model = CorpusStream.lmModel(corpus)
    assert(model.v > 0 && model.c2.nonEmpty)

    val docs = corpus.collect().map(r => (ts(8, 0), r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = CorpusStream.lmScore(stream.toDS().toDF("ts", "doc_id", "text"), model)
    val q = out.writeStream.format("memory").queryName("lm_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(docs: _*)
      // a later batch with text the model never saw: add-one smoothing
      // must price the unseen bigrams, not crash or null them
      stream.addData((ts(8, 1), 900001L, "zzz qqq zzz qqq unseen words"),
        (ts(8, 2), 900002L, "single"))
      q.processAllAvailable()

      val streamed = spark.table("lm_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_p"),
            r.getAs[Double]("avg_p"), r.getAs[Double]("min_p"))).toMap
      val batch = graft.queries.TextOps.q93LmScore(spark, sf).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      // replaying the training corpus reproduces the batch doubles exactly
      batch.foreach { case (id, exp) =>
        assert(streamed(id) == exp, s"doc $id stream ${streamed(id)} vs batch $exp")
      }
      // the unseen doc scores via smoothing: every p = 1/(c1+V) or 1/V
      val unseen = streamed(900001L)
      assert(unseen._1 == 5L && unseen._4 > 0.0 && unseen._2 < 1.0)
      // the 1-token doc passes through unscored (no bigrams)
      val single = spark.table("lm_out").collect()
        .find(_.getAs[Long]("doc_id") == 900002L).get
      assert(single.isNullAt(single.fieldIndex("n_bigrams")))
    } finally q.stop()
  }
}
