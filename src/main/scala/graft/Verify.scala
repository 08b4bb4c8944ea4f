package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // small-file scan splitting, the Bench treatment (r12): inert at
      // real scale, parallelizes CPU-dense map queries at test SFs
      .config("spark.sql.files.openCostInBytes", 16384)
      .config("spark.sql.files.minPartitionNum", cpus)
      // sort-based shuffle writer even at small reducer counts, the
      // Bench treatment (r15): the bypass-merge writer's one-file-per-
      // (map × reducer) is a small-R special case the byte-derived
      // production widths never select; plans unchanged
      .config("spark.shuffle.sort.bypassMergeThreshold", 1)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // schema-drift tripwire: fail loudly with ONE labeled message if the
    // driver regenerated testdata under types the queries don't expect
    Tables.validate(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // outDir is reused across invocations: a query that fails BEFORE its
    // write reaches the overwrite-delete (analysis/planning errors) must
    // not leave the previous run's parquet behind — the driver would
    // hash-compare the stale artifact as this run's result. Delete each
    // target up front so a failed query yields a MISSING output (a
    // labeled per-query failure downstream), never a stale one.
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        val st = Files.walk(p)
        try st.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
        finally st.close()
      }
    SparkEntry.queries.foreach { case (name, fn) =>
      // isolation: drop cached relations the previous query registered
      // (intra-query persists) so 100+ queries don't accumulate cached
      // blocks and never cross-feed each other's caches. The q104/q105
      // train memo holds localCheckpointed RDDs the CacheManager cannot
      // see — clear it too (the ScaleSweep/StageClock treatment), so
      // each query's correctness dump computes in genuine isolation and
      // the checkpoint blocks don't stay resident for the rest of the
      // run
      spark.sharedState.cacheManager.clearCache()
      // keep the CacheRegistry's frame list from growing across 105
      // queries: clearCache already dropped the blocks, this forgets
      // the (now-unpersisted) frames so the registry stays bounded
      graft.CacheRegistry.releaseAll()
      graft.queries.TextOps.clearTrainMemo()
      rmTree(Paths.get(outDir, name))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // class name too: an NPE's getMessage is null — "failed: null"
        // diagnoses nothing
        System.err.println(s"[verify] $name failed: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
