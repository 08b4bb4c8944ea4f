package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for q33 (not part of the driver contract). */
object Profile33 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      time("q33 full")(graft.queries.TextOps.q33NgramJaccard(spark, sfDir).count())
      time("q42 full")(graft.queries.TextOps.q42NeardupSurvivors(spark, sfDir).count())
    }
    spark.stop()
  }
}
