package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join operator (AsOfJoinPlan/AsOfJoinExec) against an
  * independent window-program reference, plus the edge semantics the
  * merge loop must get right. */
class AsOfJoinSpec extends SparkSuite {

  import spark.implicits._

  private def run(left: DataFrame, right: DataFrame): Set[(Long, Long, Any, Any)] =
    AsOfJoin(spark, left, right, "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .select(col("p_id"), col("p_user"), col("c_id"), col("c_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .toSet

  test("matches a window-program reference on random data") {
    val rnd = new scala.util.Random(42)
    val purchases = (1 to 500).map(i =>
      (1000L + i, rnd.nextInt(20).toLong, rnd.nextInt(10000).toLong))
      .toDF("p_id", "p_user", "p_ts")
    val clicks = (1 to 800).map(i =>
      (2000L + i, rnd.nextInt(20).toLong, rnd.nextInt(10000).toLong))
      .toDF("c_id", "c_user", "c_ts")

    // reference: union-tag + ignore-nulls window, inclusive on time with
    // (c_ts, c_id) as the within-tie order — the same semantics the exec
    // promises (greatest (time, tiebreak) <= (left time, +inf))
    val u = purchases.select(col("p_id"), col("p_user").as("u"),
        col("p_ts").as("t"), lit(null).cast("long").as("c_id"),
        lit(null).cast("long").as("c_ts"), lit(1).as("side"))
      .unionByName(clicks.select(lit(null).cast("long").as("p_id"),
        col("c_user").as("u"), col("c_ts").as("t"), col("c_id"),
        col("c_ts"), lit(0).as("side")))
    // clicks sort before purchases at equal t (side 0 < 1) → inclusive;
    // among clicks at equal t, higher c_id sorts later and wins
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("side"), col("c_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = u
      .withColumn("lc", last(when(col("side") === 0,
        struct(col("c_id"), col("c_ts"))), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("p_id"), col("u"), col("lc.c_id"), col("lc.c_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .toSet

    assert(run(purchases, clicks) == expected)
  }

  test("no qualifying click yields null right columns") {
    val p = Seq((1L, 7L, 100L), (2L, 7L, 50L)).toDF("p_id", "p_user", "p_ts")
    val c = Seq((10L, 7L, 80L), (11L, 8L, 10L)).toDF("c_id", "c_user", "c_ts")
    assert(run(p, c) == Set(
      (1L, 7L, 10L, 80L),  // 80 <= 100
      (2L, 7L, null, null) // only click is at 80 > 50; user 8's is another key
    ))
  }

  test("inclusive time and tiebreak: equal-time click wins, highest id among ties") {
    val p = Seq((1L, 5L, 100L)).toDF("p_id", "p_user", "p_ts")
    val c = Seq((10L, 5L, 100L), (11L, 5L, 100L), (9L, 5L, 40L))
      .toDF("c_id", "c_user", "c_ts")
    assert(run(p, c) == Set((1L, 5L, 11L, 100L)))
  }

  test("result is invariant to input partition layout") {
    val rnd = new scala.util.Random(7)
    val p = (1 to 200).map(i => (i.toLong, rnd.nextInt(5).toLong,
      rnd.nextInt(1000).toLong)).toDF("p_id", "p_user", "p_ts")
    val c = (1 to 300).map(i => (1000L + i, rnd.nextInt(5).toLong,
      rnd.nextInt(1000).toLong)).toDF("c_id", "c_user", "c_ts")
    val a = run(p.repartition(1), c.repartition(7))
    val b = run(p.repartition(13), c.repartition(2))
    assert(a == b)
  }

  test("left-side filter pushes below the join; right-output filter does not") {
    val p = (1 to 100).map(i => (i.toLong, (i % 5).toLong, (i * 10).toLong))
      .toDF("p_id", "p_user", "p_ts")
    val c = (1 to 100).map(i => (1000L + i, (i % 5).toLong, (i * 7).toLong))
      .toDF("c_id", "c_user", "c_ts")
    val joined = AsOfJoin(spark, p, c, "p_user", "c_user", "p_ts", "c_ts", "c_id")

    // left-column predicate → must sit BELOW AsOfJoinPlan after optimize
    val filtered = joined.filter(col("p_id") <= 10L)
    val opt = filtered.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    assert(joinNode.left.toString.contains("p_id"), opt.toString)
    assert(!opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f
    }.isDefined, opt.toString)
    // and the pushed plan returns the same rows as filtering the input
    val viaInput = AsOfJoin(spark, p.filter(col("p_id") <= 10L), c,
      "p_user", "c_user", "p_ts", "c_ts", "c_id")
    assert(filtered.collect().toSet == viaInput.collect().toSet)

    // right-output predicate must NOT push (it would change matches)
    val rightFiltered = joined.filter(col("c_id") > 1050L)
    val opt2 = rightFiltered.queryExecution.optimizedPlan
    assert(opt2.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f
    }.isDefined, opt2.toString)
  }

  test("null keys and times never match (standard join semantics)") {
    val p = Seq((Some(1L), Some(5L), Some(100L)), (Some(2L), None, Some(100L)),
        (Some(3L), Some(5L), None))
      .toDF("p_id", "p_user", "p_ts")
    val c = Seq((Some(10L), Some(5L), Some(90L)), (Some(11L), None, Some(1L)),
        (Some(12L), Some(5L), None))
      .toDF("c_id", "c_user", "c_ts")
    val got = AsOfJoin(spark, p, c, "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .select(col("p_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
    // only the fully-non-null pair (user 5, 90 <= 100) matches; the
    // null-user purchase and null-ts purchase get null; null-keyed and
    // null-ts clicks are invisible
    assert(got == Set((1L, 10L), (2L, null), (3L, null)), got.toString)
  }

  test("API rejects unknown columns and non-long keys with clear errors") {
    val p = Seq((1L, 5L, 100L)).toDF("p_id", "p_user", "p_ts")
    val c = Seq((10L, 5L, 90L)).toDF("c_id", "c_user", "c_ts")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin(spark, p, c, "nope", "c_user", "p_ts", "c_ts", "c_id")
    }
    assert(e1.getMessage.contains("nope"))
    val pStr = p.withColumn("p_user", col("p_user").cast("string"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin(spark, pStr, c, "p_user", "c_user", "p_ts", "c_ts", "c_id")
    }
    assert(e2.getMessage.toLowerCase.contains("longtype"), e2.getMessage)
  }

  test("plans as the custom exec with co-partitioned sorted children") {
    val p = Seq((1L, 5L, 100L)).toDF("p_id", "p_user", "p_ts")
    val c = Seq((10L, 5L, 90L)).toDF("c_id", "c_user", "c_ts")
    val df = AsOfJoin(spark, p, c, "p_user", "c_user", "p_ts", "c_ts", "c_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort"), plan)
  }

  test("advertised output partitioning: a same-key groupBy adds NO exchange") {
    val p = Seq((1L, 5L, 100L), (2L, 5L, 200L)).toDF("p_id", "p_user", "p_ts")
    val c = Seq((10L, 5L, 90L)).toDF("c_id", "c_user", "c_ts")
    val agg = AsOfJoin(spark, p, c, "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .groupBy(col("p_user")).count()
    val plan = agg.queryExecution.executedPlan.toString
    // exactly the join's two child exchanges — the downstream aggregate
    // must reuse the left side's hash partitioning this exec advertises
    // (pre-fix: UnknownPartitioning forced a THIRD exchange above the join)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges (join children only):\n$plan")
  }
}
