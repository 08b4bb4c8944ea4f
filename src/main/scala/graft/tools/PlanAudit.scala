package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: one-line physical-plan summary per query — shuffle count,
  * broadcast count, whole-stage-codegen spans, scans without pushdown —
  * to spot plan smells across the whole suite at a glance. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE's pre-execution plan hides WholeStageCodegen nodes — disable
      // it here so the wscg column reflects the real codegen spans
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).size
        val exch = n("Exchange hashpartitioning") + n("Exchange rangepartitioning") +
          n("Exchange RoundRobinPartitioning") + n("Exchange SinglePartition")
        val bcast = n("BroadcastExchange")
        // codegen'd operators render as "*(stageId) Op" in toString —
        // count distinct stage ids
        val wscg = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
        val scans = n("FileScan")
        val noPush = "PushedFilters: \\[\\]".r.findAllIn(p).size
        println(f"$name%-24s exch=$exch%2d bcast=$bcast%d wscg=$wscg%2d " +
          f"scans=$scans%d scansNoPush=$noPush%d")
      } catch { case e: Throwable =>
        // getMessage is null for bare NPEs etc. — the survey tool must
        // outlive any one query's failure
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        println(f"$name%-24s PLAN-ERROR ${msg.take(80)}")
      }
    }
    spark.stop()
  }
}
