package graft.tools

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** One-off diagnostic: where q33's wall time actually goes at sf0.1.
  * Not an assertion suite — prints a stage breakdown via info(). */
class Q33BreakdownSpec extends SparkSuite {

  test("q33 stage breakdown at sf0.1") {
    import graft.functions.TextFunctions.{jaccard, prefixShingles, shingles}
    val d = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      info(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      .repartition(col("doc_id"))
    // warm the kernel path once
    docs.count()
    time("scan+shingle (1x)") { docs.count() }
    val pref = docs.select(col("doc_id"), col("n"),
        explode(prefixShingles(col("sh"), lit(0.8))).as("p"))
      .select(col("doc_id"), col("n"), col("p._1").as("h"))
    time("prefix explode (1x)") { pref.count() }
    val cands = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * 4 <= col("b.n") * 5 && col("b.n") * 4 <= col("a.n") * 5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("prefix self-join + distinct") { cands.count() }
    val full = cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    time("full pipeline") { full.count() }
    succeed
  }
}
