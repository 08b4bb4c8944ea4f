package graft

import org.apache.spark.sql.DataFrame

/** Pins `Tables.cpuWidthPin` — the r13 GATED successor of the r12
  * unconditional CPU-density width pins — and, more importantly,
  * MEASURES the two parquet facts the gate's 100 TB story rests on
  * (BASELINE.md r12 asserted them from a single-row-group file only):
  *
  *  1. a single-ROW-GROUP file does not parallelize no matter how the
  *     scan splits it by bytes — every split but one comes back empty
  *     (parquet hands a row group to exactly one task), so CPU-dense
  *     map work funnels onto one core and the pin must fire;
  *  2. a multi-row-group file parallelizes NATURALLY once partition
  *     bytes are below file bytes (the at-scale geometry) — and there
  *     the pin withholds itself entirely, so the at-scale plan never
  *     pays the full-width exchange (nor its local sort) the r12
  *     unconditional pin charged on an untested "stays noise"
  *     assumption (r12 ADVICE low 3).
  */
class ScanWidthSpec extends SparkSuite {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sw_$tag").toString

  /** Non-empty partition count of the UNPINNED scan — the measured
    * parallelism parquet actually delivers. */
  private def nonEmptyParts(df: DataFrame): Int =
    df.rdd.mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)

  /** Run `body` with partition bytes far below file bytes — the
    * at-scale geometry (a 100 TB table's files dwarf maxPartitionBytes;
    * locally the default 128 MB dwarfs the file instead, hiding the
    * row-group effect entirely). */
  private def withSmallPartitions[A](body: => A): A = {
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    try body
    finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }

  test("single-row-group file: byte-splitting cannot parallelize it, so the pin fires") {
    import spark.implicits._
    val dir = tmpDir("onegroup")
    (0 until 20000).map(i => (i.toLong, s"payload_$i" * 8))
      .toDF("id", "payload").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    withSmallPartitions {
      val df = spark.read.parquet(dir)
      // the scan splits the ~1 MB file into many byte ranges (64 KB
      // partitions), but parquet assigns the one row group to the one
      // split containing its midpoint — every other task reads nothing
      assert(df.rdd.getNumPartitions > 1, "fixture too small to split")
      assert(nonEmptyParts(df) == 1,
        "expected the single row group to land on exactly one task")
      // so the gate must fire: the pinned frame reaches session width
      val pinned = Tables.cpuWidthPin(df)
      assert(!(pinned eq df), "pin unexpectedly withheld on a single-row-group table")
      assert(pinned.rdd.getNumPartitions ==
        spark.sessionState.conf.numShufflePartitions)
      val plan = pinned.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("RoundRobinPartitioning") ||
        plan.contains("REPARTITION_BY_NUM"), plan)
    }
  }

  test("multi-row-group file parallelizes naturally and the pin withholds itself (the r12 claim, now measured)") {
    import spark.implicits._
    val dir = tmpDir("multigroup")
    // a SMALL writer block size rolls many row groups into ONE file —
    // the same multi-row-group shape a 100 TB writer produces at its
    // default 128 MB block size, shrunk to test scale
    (0 until 60000).map(i => (i.toLong, s"payload_$i" * 8))
      .toDF("id", "payload").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (64 * 1024).toString)
      .option("parquet.page.size", (16 * 1024).toString)
      .parquet(dir)
    withSmallPartitions {
      val df = spark.read.parquet(dir)
      // natural parallelism, no pin anywhere: multiple NON-EMPTY tasks
      val width = spark.sessionState.conf.numShufflePartitions
      val parts = nonEmptyParts(df)
      assert(parts >= width,
        s"expected >=$width non-empty scan tasks from a multi-row-group file, got $parts")
      // and the gate sees the footers and withholds the pin — the
      // returned frame IS the input frame (plan-neutral by construction)
      assert(Tables.cpuWidthPin(df) eq df)
    }
  }

  test("many SMALL files still pin while bytes cannot guarantee the width (r13 review)") {
    // >=width files is >=width row groups, but how Spark PACKS files
    // into scan partitions depends on byte heuristics that vary with
    // the session's core count (bytesPerCore, openCostInBytes) — a
    // handful of multi-MB single-row-group files on a 32-core session
    // packs to well under session width. The gate therefore demands
    // total bytes >= width x maxPartitionBytes (the deployment-
    // independent bound) before trusting the file count, and a
    // tiny-file table keeps the pin even though its file count alone
    // looks parallel.
    import spark.implicits._
    val dir = tmpDir("manytiny")
    (0 until 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartition(8)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.inputFiles.length >= spark.sessionState.conf.numShufflePartitions)
    val pinned = Tables.cpuWidthPin(df)
    assert(!(pinned eq df), "pin withheld on a byte-packed tiny-file table")
    assert(pinned.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
  }

  test("many files withhold the pin once bytes can feed the width (no footer reads needed)") {
    import spark.implicits._
    val dir = tmpDir("manyfiles")
    (0 until 40000).map(i => (i.toLong, s"payload_$i" * 8)).toDF("id", "payload")
      .repartition(8)
      .write.mode("overwrite").parquet(dir)
    withSmallPartitions {
      val df = spark.read.parquet(dir)
      assert(df.inputFiles.length >= spark.sessionState.conf.numShufflePartitions)
      val parts = nonEmptyParts(df)
      assert(parts >= spark.sessionState.conf.numShufflePartitions, s"got $parts")
      assert(Tables.cpuWidthPin(df) eq df)
    }
  }

  test("a non-file-backed frame gets the pin (no evidence of parallelism, err toward pinning)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    val pinned = Tables.cpuWidthPin(df)
    assert(pinned.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
  }
}
