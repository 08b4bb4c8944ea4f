package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HllDistinctSpec extends SparkSuite {

  import spark.implicits._

  private def estimates(n: Int, parts: Int) = {
    val df = spark.range(n).repartition(parts)
      .select(col("id").cast("string").as("k"))
      .agg(GraftFunctions.hllDistinct(col("k")).as("sk"))
      .select(col("sk.est_hll"), col("sk.v_empty"), col("sk.s_fixed"))
    df.collect().head
  }

  test("estimate within 6% of exact across cardinality regimes") {
    // standard error at p=12 is 1.04/sqrt(4096) ~ 1.6%; these are single
    // deterministic draws, so allow ~3-4 sigma (the n=200000 draw sits at
    // 5.2% — verified identical in an independent reference
    // implementation, i.e. estimator variance, not an implementation bug)
    for (n <- Seq(100, 1000, 20000, 200000)) {
      val est = estimates(n, 8).getDouble(0)
      val err = math.abs(est - n) / n
      assert(err < 0.06, s"n=$n est=$est err=$err")
    }
  }

  test("partition layout does not change the sketch (merge is exact)") {
    val a = estimates(50000, 1)
    val b = estimates(50000, 32)
    assert(a == b, s"$a vs $b")
  }

  test("duplicates do not move the estimate") {
    val once = spark.range(5000).select(col("id").cast("string").as("k"))
    val dup = once.union(once).union(once)
    val e1 = once.agg(GraftFunctions.hllDistinct(col("k")).as("sk"))
      .select(col("sk.s_fixed")).collect().head
    val e3 = dup.agg(GraftFunctions.hllDistinct(col("k")).as("sk"))
      .select(col("sk.s_fixed")).collect().head
    assert(e1 == e3)
  }

  test("registered in SQL as graft_hll_distinct") {
    GraftFunctions.ensureRegistered(spark)
    spark.range(1000).select(col("id").cast("string").as("k"))
      .createOrReplaceTempView("hll_in")
    val est = spark.sql(
      "SELECT graft_hll_distinct(k).est_hll AS e FROM hll_in")
      .collect().head.getDouble(0)
    assert(math.abs(est - 1000) / 1000 < 0.05, est.toString)
  }

  test("nulls are ignored, empty input gives zero-ish estimate") {
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    val r = df.agg(GraftFunctions.hllDistinct(col("k")).as("sk"))
      .select(col("sk.est_hll"), col("sk.v_empty")).collect().head
    // linear counting is exact at tiny cardinalities
    assert(math.round(r.getDouble(0)) == 2L, r.toString)
    val empty = spark.emptyDataset[String].toDF("k")
      .agg(GraftFunctions.hllDistinct(col("k")).as("sk"))
      .select(col("sk.est_hll")).collect().head.getDouble(0)
    assert(empty == 0.0, empty.toString)
  }
}
