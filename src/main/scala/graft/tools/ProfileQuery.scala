package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: cold-vs-warm timing for any query set (comma-separated in
  * SPARK_GRAFT_QUERIES) — distinguishes plan cost from JIT/codegen
  * warmup before reaching for structural changes. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "q33_ngram_jaccard,q42_neardup_survivors").split(",").toSeq
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round --")
      names.foreach { n =>
        time(n)(org.apache.spark.sql.GraftColumnBridge.forceOwnPlan(
          graft.SparkEntry.queries(n)(spark, sfDir)))
      }
    }
    spark.stop()
  }
}
