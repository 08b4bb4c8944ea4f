package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the LM bigram extraction (r15): the interpreted
  * `transform(sequence(...), i -> struct(...))` SQL twin
  * (TextOps.lmBigramExpr) vs the native [[graft.functions.WordBigrams]]
  * loop, on the real corpus replicated `mult`× so the per-token term
  * rises above the stage-machinery floor (the bench corpus alone is
  * ~270k bigrams — sub-0.1 s either way). Cross-checks the full
  * exploded (doc_id, pos, w1, w2) streams for row equality first,
  * exactly like SplitBench does for the tokenizer.
  *
  * runMain graft.tools.BigramBench <sfDir> [mult] [reps]
  */
object BigramBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 3
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
      .select(col("doc_id"), col("text"))
      .withColumn("r", explode(lit((0 until mult).toArray)))
      .select((col("doc_id") * mult + col("r")).as("doc_id"), col("text"))
      .repartition(32).persist()
    println(s"BIGRAMBENCH docs=${docs.count()} (mult=$mult)")

    val w = docs.select(col("doc_id"), litSplit(col("text"), " ").as("w"))
    def flat(bigrams: org.apache.spark.sql.Column): DataFrame =
      w.select(col("doc_id"), explode(bigrams).as("b"))
        .select(col("doc_id"), col("b.pos"), col("b.w1"), col("b.w2"))
    val twin = flat(expr(graft.queries.TextOps.lmBigramExpr))
    val native = flat(graft.functions.GraftFunctions.wordBigrams(col("w")))

    // equality first: the full exploded bigram streams must be identical
    val diff = twin.exceptAll(native).count() + native.exceptAll(twin).count()
    println(s"BIGRAMBENCH bigram-stream diff rows: $diff")
    require(diff == 0, "WordBigrams diverges from the SQL twin!")

    def time(label: String, df: DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = org.apache.spark.sql.GraftColumnBridge.forceOwnPlan(df)
      println(f"BIGRAMBENCH $label%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    for (_ <- 1 to reps) { time("twin", twin); time("native", native) }

    // r15 second section: the lmFold per-doc reassembly — interpreted
    // array_sort comparator + aggregate fold vs the native
    // PosOrderedSum, over the same inflated bigram stream with a
    // deterministic synthetic p
    val scored = native.withColumn("p", lit(1.0) / (col("pos") + lit(1.0)))
    val foldTwin = scored.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("p")))).as("pp"))
      .select(col("doc_id"), expr(
        "aggregate(pp, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.p)").as("s"))
    val foldNat = scored.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("pos"), col("p"))).as("pp"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.posOrderedSum(col("pp")).as("s"))
    val fdiff = foldTwin.exceptAll(foldNat).count() +
      foldNat.exceptAll(foldTwin).count()
    println(s"BIGRAMBENCH fold diff rows: $fdiff")
    require(fdiff == 0, "PosOrderedSum diverges from the SQL fold!")
    for (_ <- 1 to reps) { time("foldtwin", foldTwin); time("foldnat", foldNat) }
    spark.stop()
  }
}
