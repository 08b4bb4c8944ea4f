package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway micro-bench driver for isolating one query's cost outside
  * the full Bench run (fresh cache per rep, optional executed-plan dump).
  *
  * Usage: runMain graft.tools.Scratch <sfDir> <q1,q2,...> [reps]
  *        SCRATCH_EXPLAIN=1 additionally prints each executed plan.
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
    // SCRATCH_CONF="k=v;k2=v2" applies runtime SQL confs for A/B runs
    sys.env.get("SCRATCH_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    graft.SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(spark, sfDir).count())
    for (r <- 1 to reps; n <- names) {
      // SCRATCH_KEEP=1 mimics Bench (shared cache across queries)
      if (!sys.env.contains("SCRATCH_KEEP")) spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // own-plan forcing (r12) — also makes SCRATCH_EXPLAIN print the
      // plan that actually ran, not a count-pruned sibling
      val cnt = org.apache.spark.sql.GraftColumnBridge.forceOwnPlan(df)
      println(f"SCRATCH $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
      if (sys.env.contains("SCRATCH_EXPLAIN")) {
        println(s"==== $n executed plan ====")
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
