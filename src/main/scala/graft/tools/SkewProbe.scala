package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Dev-only: adversarial-skew evidence for the dedup family.
  *
  * SCALING_r08/r09 prove growth laws on the driver's UNIFORM corpora; a
  * real 100 TB crawl has hot shingles (boilerplate footers in a third of
  * the web). This tool synthesizes that adversary — it appends one fixed
  * boilerplate sentence to 30% of the sf0.1 documents, which plants ~4
  * bigram shingles each shared by ~1500 docs — and measures per-STAGE
  * task-time skew (max vs median) for the inverted-index dedup queries,
  * against the unmodified corpus as the control.
  *
  * Why task-time ratio and not wall: the failure mode of a hot key in a
  * shingle-partitioned self-join is ONE reducer producing the hot
  * bucket's candidate cross-product while 31 idle — wall degrades by
  * the straggler, but max/median task time is the direct signature
  * (and the number that predicts the 1000-executor cluster, where the
  * idle fraction is 999/1000).
  *
  * The engine's designs are expected to bound this WITHOUT new code:
  * q33/q88's prefixes keep only each doc's lowest-hash shingles, so a
  * hot shingle enters at most the prefixes whose docs have few rarer
  * tokens; the candidate joins are sort-merge under AQE, whose skew
  * split divides an inflated partition across tasks even for a single
  * hot key (the other side's partition is replicated per split). This
  * artifact turns that expectation into a measured number per query —
  * and if a ratio blows up on the hot corpus but not the control, that
  * query gets an ops/Skew mitigation with the before number recorded.
  *
  * runMain graft.tools.SkewProbe [outJson]   (default SKEW_r09.json)
  * env: SKEW_BASE_SF (default /root/testdata/sf0.1),
  *      SKEW_QUERIES (default the dedup-family four).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val outPath = if (args.nonEmpty) args(0) else "SKEW_r10.json"
    val baseSf = sys.env.getOrElse("SKEW_BASE_SF", "/root/testdata/sf0.1")
    val queries = sys.env.get("SKEW_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q32_dedup_exact", "q33_ngram_jaccard", "q33_hashorder",
        "q34_minhash_lsh", "q88_containment_join"))
    // the retired hash-ordered q33 rides along under a dev name (not
    // part of the driver contract) so the A/B stays reproducible; its
    // output is asserted equal to the df-ordered default below
    val extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("q33_hashorder" -> (graft.queries.TextOps.q33NgramJaccardHashOrdered _),
        "q33_hybrid" -> (graft.queries.TextOps.q33NgramJaccardHybridOrdered _))

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- synthesize the hot-key corpus -------------------------------
    // one boilerplate sentence on 30% of docs (doc_id % 10 < 3): every
    // treated doc gains the same ~4 bigram shingles (and, for q99, ~10
    // identical 25-char grams) → hot inverted-index/window keys with
    // df ≈ 0.3·N.
    val skewDir = "/tmp/skewdata/sf0.1"
    spark.read.parquet(s"$baseSf/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 10 < 3,
          concat(col("text"), lit(" lorem ipsum dolor sit amet footer")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
    // q84's input is CUSTOMER, which the boilerplate edit never touches —
    // its hot-key adversary is a duplicate-name family (the entity-res
    // real case: one canonical string mass-duplicated by an upstream
    // feed). Every 300th customer gets the same name → all its FastSS
    // deletion variants become hot join keys carrying a genuine
    // |family|² candidate set; the probe's question is whether that
    // work SPREADS (AQE skew split) or funnels into one task. The
    // family is capped (~N/300) so the legitimate quadratic output
    // stays small next to the corpus.
    if (new java.io.File(s"$baseSf/customer.parquet").exists)
      spark.read.parquet(s"$baseSf/customer.parquet")
        .withColumn("c_name",
          when(col("c_custkey") % 300 === 0, lit("Customer#HOTFAMILY0000"))
            .otherwise(col("c_name")))
        .write.mode("overwrite").parquet(s"$skewDir/customer.parquet")

    // --- per-task listener: durations per stage ----------------------
    val stageTasks = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null && e.taskInfo.successful)
          stageTasks.synchronized {
            stageTasks.getOrElseUpdate(e.stageId,
              mutable.ArrayBuffer.empty[Long]) += e.taskInfo.duration
          }
    })
    def reset(): Unit = stageTasks.synchronized(stageTasks.clear())

    import graft.JsonNum.num
    val rows = mutable.ArrayBuffer.empty[String]
    def publish(): Unit = {
      val out = java.nio.file.Paths.get(outPath)
      val tmp = out.resolveSibling(out.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp,
        rows.mkString("[\n", ",\n", "\n]\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    def lookup(q: String) = extra.get(q).orElse(graft.SparkEntry.queries.get(q))

    // losslessness cross-check: both prefix orders must produce the
    // EXACT q33 rows on both corpora before the timings mean anything
    // (only when a q33 variant is actually being probed — the check
    // costs four full q33 runs at the probe decade)
    val checkQ33 = queries.exists(_.startsWith("q33"))
    for ((label, dir) <- Seq("base" -> baseSf, "hotkey" -> skewDir) if checkQ33) {
      val a = graft.queries.TextOps.q33NgramJaccard(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      val b = graft.queries.TextOps.q33NgramJaccardHashOrdered(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      require(a == b, s"q33 prefix-order variants diverge on $label")
      if (queries.contains("q33_hybrid")) {
        val c = graft.queries.TextOps.q33NgramJaccardHybridOrdered(spark, dir)
          .collect().map(_.toString).sorted.toSeq
        require(a == c, s"q33 hybrid prefix order diverges on $label")
      }
      println(s"[skewprobe] q33 variants identical on $label (${a.size} pairs)")
      spark.sharedState.cacheManager.clearCache()
    }

    // warm the kernels once so neither dataset is charged JIT
    queries.foreach(q => lookup(q).foreach(f => f(spark, baseSf).count()))

    for ((label, dir) <- Seq("base" -> baseSf, "hotkey" -> skewDir);
         q <- queries) {
      lookup(q) match {
        case None => System.err.println(s"[skewprobe] unknown query $q — skipped")
        case Some(f) =>
          // rep1 absorbs per-(dataset,query) first-execution codegen;
          // rep2 is recorded. Cold cache both reps (ScaleSweep recipe).
          var wall = 0.0; var n = 0L
          var stats: Seq[(Int, Int, Long, Long)] = Nil // (stage, tasks, max, med)
          for (rep <- 1 to 2) {
            org.apache.spark.sql.GraftColumnBridge.drainListenerBus(spark)
            spark.sharedState.cacheManager.clearCache()
            graft.queries.TextOps.clearTrainMemo()
            System.gc()
            reset()
            val t0 = System.nanoTime()
            n = f(spark, dir).count()
            wall = (System.nanoTime() - t0) / 1e9
            org.apache.spark.sql.GraftColumnBridge.drainListenerBus(spark)
            if (rep == 2) stats = stageTasks.synchronized {
              stageTasks.toSeq.map { case (sid, ds) =>
                val sorted = ds.sorted
                (sid, ds.size, sorted.last, sorted(sorted.size / 2))
              }
            }
          }
          // the dominant stage (largest max task) carries the skew
          // verdict; ratios on sub-200ms stages are scheduling noise,
          // so the "meaningful" worst ratio only looks above that floor.
          // A query whose rep-2 plan records no stage tasks at all
          // (collapsed to a driver-local/cached result) still emits its
          // row — with dominant_stage null — instead of aborting the
          // probe and losing every other query's rows (r9 advice).
          val meaningful = stats.filter(s => s._3 >= 200 && s._2 >= 8)
          val worst = if (meaningful.isEmpty) 0.0
            else meaningful.map(s => s._3.toDouble / math.max(s._4, 1L)).max
          def stageJson(s: (Int, Int, Long, Long)) =
            s"""{"tasks":${s._2},"max_ms":${s._3},"med_ms":${s._4},""" +
              s""""ratio":${num("%.2f", s._3.toDouble / math.max(s._4, 1L))}}"""
          val dominantJson =
            if (stats.isEmpty) "null" else stageJson(stats.maxBy(_._3))
          val line =
            s"""{"dataset":"$label","query":"$q","rows":$n,""" +
              s""""wall_s":${num("%.3f", wall)},"n_stages":${stats.size},""" +
              s""""dominant_stage":$dominantJson,""" +
              s""""worst_meaningful_ratio":${num("%.2f", worst)}}"""
          println(line)
          rows += line
          publish()
      }
    }
    spark.stop()
  }
}
