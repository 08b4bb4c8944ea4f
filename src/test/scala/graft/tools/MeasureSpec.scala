package graft.tools

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MeasureSpec extends SparkSuite {

  import spark.implicits._

  test("rolls up shuffle bytes and exchange count from the executed plan") {
    val df = spark.range(10000).select((col("id") % 100).as("k"), col("id"))
      .groupBy(col("k")).agg(sum(col("id")).as("s"))
    val m = Measure.run(df)
    assert(m.exchanges >= 1, m.toString)
    assert(m.shuffleBytes > 0, m.toString)
    assert(m.shuffleRecords > 0, m.toString)
  }

  test("q01 shuffles partial aggregates, not rows (empirical map-side combine)") {
    // 6k lineitem rows collapse to 6 groups; with partial aggregation
    // the exchange carries at-most groups x maptasks records — orders of
    // magnitude under the row count. This measures the property PlanSpec
    // pins structurally.
    val m = Measure.run(
      graft.queries.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001"))
    assert(m.rows == 6, m.toString)
    assert(m.shuffleRecords > 0 && m.shuffleRecords < 1000, m.toString)
  }

  test("a shuffle-free scan reports zero exchanges") {
    val df = spark.range(1000).select(col("id") + 1)
    val m = Measure.run(df)
    assert(m.exchanges == 0 && m.shuffleBytes == 0, m.toString)
  }
}
