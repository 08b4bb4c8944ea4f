package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** Physical-plan audit (the "explain and iterate" discipline): these
  * assertions pin the plan properties the 100 TB design depends on —
  * filter pushdown reaching the parquet scan, column pruning, broadcast
  * join selection — so a refactor that silently regresses them fails CI,
  * not the cluster. */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q08 keyset predicate is pushed to the parquet scan") {
    val p = plan(Relational.q08KeysetPage(spark, sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThan(o_orderkey,1000)"), p)
  }

  test("q01 scan prunes to the 6 referenced lineitem columns") {
    val p = plan(Relational.q01PricingSummary(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
  }

  test("q03 dimension joins broadcast (no shuffle of the fact side for nation)") {
    val p = plan(Relational.q03RevenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q36 broadcasts the query side against a single corpus scan") {
    val p = plan(Vectors.q36CosineTopk(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q27 point lookup pushes all three conjuncts") {
    val p = plan(Packets.q27PointLookup(spark, sf))
    assert(p.contains("EqualTo(c_nationkey,5)"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("GreaterThan(c_acctbal,0.0)"), p)
  }

  test("q32 dedup is a partial-aggregate (map-side combine) plan") {
    val p = plan(TextOps.q32DedupExact(spark, sf))
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    // AQE's pre-execution explain hides codegen spans; inspect the final
    // executed plan after an action
    val df = Relational.q01PricingSummary(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the executed plan
    assert(p.contains("*(1)") && p.contains("HashAggregate"), p)
  }
}
