package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway micro-bench driver for isolating one query's cost.
  * Usage: runMain graft.tools.Scratch <sfDir> <qname> [reps]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(spark, sfDir).count())
    for (r <- 1 to reps; n <- names) {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val cnt =
        if (n == "v_nopersist") q33NoPersist(spark, sfDir).count()
        else if (n == "v_cc") ccRounds(spark, sfDir)
        else if (sys.env.contains("SCRATCH_EXPLAIN")) {
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          val c = df.count()
          println(s"==== $n executed plan ====")
          println(df.queryExecution.executedPlan.toString.take(8000))
          c
        } else graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"SCRATCH $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
    }
    spark.stop()
  }

  import org.apache.spark.sql.{DataFrame, SparkSession => SS}
  import org.apache.spark.sql.functions._

  def ccRounds(s: SS, d: String): Long = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"  CC $tag ${(now - t) / 1e9}%.2f s"); t = now
    }
    val pairs = graft.queries.TextOps.q33NgramJaccard(s, d)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("u", "v").persist(mem)
    var labels = edges.select(col("u")).distinct()
      .select(col("u"), col("u").as("lbl")).persist(mem)
    labels.count(); lap("init")
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      val viaNbr = edges
        .join(labels.select(col("u").as("v"), col("lbl")), Seq("v"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nl"))
      val next = labels.select(col("u"), col("lbl").as("old"))
        .join(viaNbr, Seq("u"), "left")
        .select(col("u"), col("old"),
          least(col("old"), coalesce(col("nl"), col("old"))).as("lbl"))
        .persist(mem)
      converged = next.filter(col("lbl") =!= col("old")).isEmpty
      labels.unpersist()
      labels = next.select(col("u"), col("lbl"))
      lap(s"round $round")
    }
    labels.count()
  }

  def q33NoPersist(s: SS, d: String): DataFrame = {
    import graft.functions.TextFunctions.{jaccard, prefixShingles, shingles}
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      .repartition(col("doc_id"))
    val pref = docs.select(col("doc_id"), col("n"),
        explode(prefixShingles(col("sh"), lit(0.8))).as("p"))
      .select(col("doc_id"), col("n"), col("p._1").as("h"), col("p._2").as("s"))
    val cands = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * 4 <= col("b.n") * 5 && col("b.n") * 4 <= col("a.n") * 5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
