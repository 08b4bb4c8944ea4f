package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev-only (r16): pairwise sameResult over one query's shuffle
  * exchanges — tells whether physical exchange reuse CAN fire (the
  * canonicalized subtrees match) for duplicated subplans like q93's
  * c2-under-c1. runMain graft.tools.CanonCheck <sfDir> <query> */
object CanonCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      // static plan: canonical equality is AQE-independent, and the
      // non-adaptive planner also shows whether the ReuseExchange rule
      // itself fires (a ReusedExchangeExec in place of the duplicate)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "all" sweeps every declared query in ONE JVM, flagging exchange
    // pairs that are canonically equal (missed reuse — should not
    // happen, ReuseExchange handles those) or equal-modulo-Filter
    // lines (the r16 divergent-isnotnull-pushdown class that silently
    // duplicates a whole subtree's work)
    val names =
      if (args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else Seq(args(1))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, args(0))
      val plan = df.queryExecution.executedPlan
      val exs = plan.collect { case e: ShuffleExchangeExec => e }
      if (names.size == 1) {
        println(s"exchanges=${exs.size}")
        exs.zipWithIndex.foreach { case (e, i) =>
          println(s"[$i] ${e.outputPartitioning} rows~${e.child.getClass.getSimpleName}")
        }
      } else println(s"$name exchanges=${exs.size}")
      // normalize tree-drawing indents, codegen-span ids and plan ids
      // (all cosmetic), then drop Filter lines — what's left differing
      // means the subtrees do genuinely different work
      def stripped(e: ShuffleExchangeExec): String =
        e.canonicalized.treeString.linesIterator
          .map(_.replaceAll("^[\\s:+|-]*", "")
            .replaceAll("\\*\\(\\d+\\) ", "")
            .replaceAll("\\[plan_id=\\d+\\]", ""))
          .filterNot(l => l.startsWith("Filter") || l.startsWith("!Filter"))
          .mkString("\n")
      for (i <- exs.indices; j <- exs.indices if i < j) {
        if (exs(i).sameResult(exs(j)))
          println(s"  SAME: $i $j -> ${exs(i).outputPartitioning}")
        else if (stripped(exs(i)) == stripped(exs(j)))
          println(s"  NEAR(filter-only diff): $i $j -> ${exs(i).outputPartitioning}")
      }
      // CANON_DUMP=i,j writes both canonicalized trees for a diff
      sys.env.get("CANON_DUMP").foreach { ij =>
        val Array(i, j) = ij.split(",").map(_.toInt)
        java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/canon_$i.txt"),
          exs(i).canonicalized.treeString.getBytes("UTF-8"))
        java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/canon_$j.txt"),
          exs(j).canonicalized.treeString.getBytes("UTF-8"))
        println(s"wrote /tmp/canon_$i.txt /tmp/canon_$j.txt")
      }
    }
    spark.stop()
  }
}
