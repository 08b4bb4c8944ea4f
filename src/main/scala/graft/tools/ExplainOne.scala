package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the full executed plan of the queries named in
  * SPARK_GRAFT_QUERIES (AQE final plan after execution, so ReusedExchange
  * and runtime join selections are visible). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "q33_ngram_jaccard")
      .split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.count() // execute so AQE finalizes the plan
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
