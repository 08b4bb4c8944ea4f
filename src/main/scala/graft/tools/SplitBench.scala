package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the tokenization hot path (r15): the builtin
  * regex `split` vs the native byte-scan [[graft.functions.LiteralSplit]]
  * on the real corpus — word-count aggregation shape (q100's vocab
  * build / q93's bigram source). Also cross-checks row-for-row equality
  * of the two token streams before any call site swaps.
  *
  * runMain graft.tools.SplitBench <sfDir> [reps]
  */
object SplitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", 1)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraftFunctions.litSplit

    val docs = graft.Tables.documents(spark, sfDir)
      .repartition(32).persist()
    docs.count()

    def vocabShape(tok: DataFrame => org.apache.spark.sql.Column): DataFrame =
      docs.select(explode(tok(docs)).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("c"))

    val builtin = vocabShape(d => split(d("text"), " "))
    val native = vocabShape(d => litSplit(d("text"), " "))

    // equality first: the full exploded token streams must be identical
    val a = docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
    val b = docs.select(col("doc_id"), posexplode(litSplit(col("text"), " ")))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"SPLITBENCH token-stream diff rows: $diff")
    require(diff == 0, "LiteralSplit diverges from builtin split!")

    def time(label: String, df: DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = org.apache.spark.sql.GraftColumnBridge.forceOwnPlan(df)
      println(f"SPLITBENCH $label%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    for (_ <- 1 to reps) { time("builtin", builtin); time("native", native) }

    // r15 second contender: the classifier feature builder's non-empty
    // word stream — builtin regex split + interpreted filter HOF vs the
    // native drop-empty byte walk (LiteralSplitWords)
    import graft.functions.GraftFunctions.litSplitWords
    val wordsSql = docs.select(col("doc_id"),
      posexplode(expr("filter(split(text, ' '), w -> w <> '')")))
    val wordsNat = docs.select(col("doc_id"),
      posexplode(litSplitWords(col("text"), " ")))
    val wdiff = wordsSql.exceptAll(wordsNat).count() +
      wordsNat.exceptAll(wordsSql).count()
    println(s"SPLITBENCH word-stream (drop-empty) diff rows: $wdiff")
    require(wdiff == 0, "LiteralSplitWords diverges from filter(split(...))!")
    for (_ <- 1 to reps) {
      time("filtsql", wordsSql); time("filtnat", wordsNat)
    }
    spark.stop()
  }
}
