package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: exact row census of q99's gram pipeline per corpus — the
  * numbers that attribute a per-exchange byte step to data growth vs
  * wire overhead (r11 verdict nit 1: q99's gram-window exchange stepped
  * 2.48× for 2× data sf10→sf20 where the explode stepped 2.22×; this
  * tool separates "more hit rows" from "worse compression").
  *
  * Prints, per sfDir: total gram positions (the explode/window input),
  * duplicated-gram positions (the window's OUTPUT rows — q99's "hits"),
  * distinct grams, and duplicated distinct grams. All exact counts —
  * deterministic functions of the corpus, no timing.
  *
  * runMain graft.tools.GramCensus <sfDir1> <sfDir2> ...
  */
object GramCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val L = graft.queries.TextOps.SubstrL // the census must track q99's gram length
    for (d <- args) {
      // native kernel (r13): the SQL substring transform is quadratic
      // per document — the census must use the same linear inventory
      // q99 runs, or a long doc stalls the census exactly like the
      // query it measures
      val grams = spark.read.parquet(s"$d/documents.parquet")
        .select(explode(
          graft.functions.GraftFunctions.charGrams(col("text"), L)).as("x"))
        .select(col("x.gram").as("gram"))
      // one wide gram agg (the window's partition structure), then a
      // four-way census over it — map-side combinable, no windows
      val r = grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .agg( // coalesce: sum() over ZERO groups is null (empty corpus / all-short texts) — print zeros, don't NPE
          coalesce(sum(col("cnt")), lit(0L)).as("positions"),
          count(lit(1)).as("distinct_grams"),
          coalesce(sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)), lit(0L)).as("hits"),
          coalesce(sum(when(col("cnt") >= 2, 1L).otherwise(0L)), lit(0L)).as("dup_grams"))
        .head()
      println(s"""{"sf":"${d.split('/').filter(_.nonEmpty).last}",""" +
        s""""positions":${r.getLong(0)},"distinct_grams":${r.getLong(1)},""" +
        s""""hits":${r.getLong(2)},"dup_grams":${r.getLong(3)}}""")
    }
    spark.stop()
  }
}
