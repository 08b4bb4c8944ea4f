package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.6, §2.7, §2.9).
  *
  * The reference's own query surface is tiny (ORM point lookups + keyset
  * pagination, `auditing/db/DataCollector.py:40-55`, `Service.py:49-50`);
  * the engine inherits the full relational algebra from Spark SQL. Each
  * query here exercises one family over the TESTDATA tables and is paired
  * with a DuckDB oracle in [[oracle]].
  *
  * Determinism rules (the driver hash-compares values):
  *   - money/double sums go through DECIMAL casts so the sum is exact and
  *     order-independent, then cast back to double — both engines then
  *     produce bit-identical doubles;
  *   - every query ends in a total ORDER BY;
  *   - no `round()` (Spark HALF_UP vs DuckDB HALF_EVEN), no raw
  *     double aggregation.
  */
object Relational {

  private val dec = "decimal(18,2)"

  /** TPC-H Q1-shaped pricing summary: multi-aggregate hash aggregation
    * with exact decimal arithmetic. (SURVEY §2.6 — engine-side groupBy/agg.)
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // quantity routes through DECIMAL like the money columns: it is
        // integer-valued today (so this is hash-neutral), but a raw
        // double sum would turn shuffle-order-dependent the moment a
        // regeneration ships fractional quantities — the file's own
        // determinism rule, applied to ALL double sums (also q04/q07)
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec) *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("sum_disc_price"),
        sum(col("l_extendedprice").cast(dec) *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")) *
          (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(4,2)")))
          .cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(dec)).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Top-k by computed measure: sort+limit (the reference's only ordering is
    * keyset pagination, Service.py:49-50 — this is the general form).
    *
    * The money arithmetic runs in EXACT integer 10⁻⁴-dollar units (price
    * cents × discount percent), not decimal: the per-group sum stays far
    * below 2⁵³, so `sum/10⁴` converts to double correctly rounded —
    * bit-identical to the oracle's CAST(SUM(DECIMAL) AS DOUBLE) — while
    * the 150k-group aggregation uses the codegen long fast-path instead
    * of 128-bit decimal buffers. */
  def q02TopRevenueOrders(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("p4"),
        (col("l_discount").cast("decimal(4,2)") * 100).cast("long").as("d2"))
      .groupBy(col("l_orderkey"))
      .agg((sum(col("p4") * (lit(100L) - col("d2"))).cast("double") / 10000.0)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Multi-way join + agg with a broadcast dimension (SURVEY §1.1.4 dim
    * tables are broadcast-joined; nation/region are tiny at any SF). */
  def q03RevenueByNation(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(dec)).cast("double").as("total_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))

  /** Broadcast fact⋈dim join + min/max aggregation. */
  def q04BrandStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"))
      .orderBy(col("p_brand"))

  /** Window functions: lag / row_number / exact running sum per key over the
    * events stream table (the replay/reset detector shape from SURVEY §2.9 —
    * `lag(f_count) over (partition by dev_eui order by tmst)`). */
  def q05WindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
      .withColumn("running_value",
        sum(col("value").cast(dec)).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .select(col("user_id"), col("rn"), col("event_id"), col("prev_event_id"),
        col("running_value"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Set operations (SURVEY §2.9: union/intersect/except). Tags each branch
    * so one result covers all three. */
  def q06SetOps(s: SparkSession, d: String): DataFrame = {
    val custNations = customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
    custNations.intersect(suppNations).withColumn("op", lit("both"))
      .unionByName(custNations.except(suppNations).withColumn("op", lit("cust_only")))
      .unionByName(suppNations.except(custNations).withColumn("op", lit("supp_only")))
      .orderBy(col("op"), col("nationkey"))
  }

  /** ROLLUP grouping sets (SURVEY §2.6 note: inherited from Spark, must work
    * over the fact table). Null grouping keys are coalesced to 'ALL' so the
    * oracle compare is independent of engine null-ordering defaults. */
  def q07Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Keyset pagination — the reference's only real query shape
    * (Service.py:49-50: `id > from_id ORDER BY id LIMIT size`). */
  def q08KeysetPage(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") > 1000)
      .orderBy(col("o_orderkey"))
      .limit(100)

  /** Semi/anti joins (SURVEY §2.9): customers with vs without orders,
    * counted per nation. */
  def q09SemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).select(col("o_custkey"))
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit(true))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit(false))
    withOrders.unionByName(withoutOrders)
      .orderBy(col("c_nationkey"), col("has_orders"))
  }

  /** Exact distinct aggregation (SURVEY §2.6 — engine-side countDistinct). */
  def q10Distinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Scalar-subquery shape: orders above the global average price. The
    * average is computed with exact decimal arithmetic on both sides so the
    * comparison boundary is deterministic. */
  def q11AboveAvg(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val avgDf = o.agg(
      (sum(col("o_totalprice").cast(dec)).cast("double") / count(lit(1))).as("avg_price"))
    o.crossJoin(avgDf)
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Conditional (pivot-style) aggregation over the events table. */
  def q12EventPivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", lit(1)).otherwise(lit(0))).as("n_purchase"),
        sum(when(col("event_type") === "click", lit(1)).otherwise(lit(0))).as("n_click"),
        sum(when(col("event_type") === "error", lit(1)).otherwise(lit(0))).as("n_error"),
        sum(when(col("event_type") === "purchase", col("value").cast(dec))
          .otherwise(lit(0).cast(dec))).cast("double").as("purchase_value"))
      .orderBy(col("user_id"))

  /** q70: the rest of the window-function family (§2.9 breadth) —
    * ntile / percent_rank / cume_dist / dense_rank / nth_value over one
    * (status, totalprice) sort. The o_orderkey tiebreak makes the order
    * total, so every ranking value is deterministic in both engines;
    * nth_value gets an explicit unbounded frame (the default
    * up-to-current frame would return null for the first two rows). */
  def q70WindowZoo(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .withColumn("tile", ntile(10).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .withColumn("third_key", nth_value(col("o_orderkey"), 3).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("o_orderkey"), col("o_orderstatus"), col("tile"), col("pr"),
        col("cd"), col("dr"), col("third_key"))
      .orderBy(col("o_orderkey"))
  }

  /** q71: unpivot (wide→long melt) — the inverse of q12's pivot, via the
    * native `Dataset.unpivot` operator (per-row map work, no shuffle;
    * the oracle states the same thing as a UNION ALL, which is what
    * unpivot must be semantically equal to). */
  def q71Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
    wide.unpivot(
        Array(col("user_id")),
        Array(col("n_purchase"), col("n_click"), col("n_error")),
        "metric", "n")
      .orderBy(col("user_id"), col("metric"))
  }

  /** CUBE grouping sets (SURVEY §2.6/§2.9 — all 4 combinations). */
  def q18Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** Exact interpolated percentiles (median/p95) — Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition on
    * doubles. */
  def q19Percentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** TPC-H Q3 shape: selective filters on both join sides + computed-
    * measure top-k — exercises join ordering with date pushdown. */
  def q45ShippingPriority(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d).filter(col("o_orderdate") < "1998-01-01"),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_shipdate") > "1998-01-01"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(dec) *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5 shape: five-way join through the region→nation→customer/
    * supplier star with co-located nation keys. */
  def q46LocalSupplier(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast(dec) *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** TPC-H Q4 shape: EXISTS semi-join with a predicate on the inner side. */
  def q47OrderPriorityCheck(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d).filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** q55: PII scrubbing — regex redaction of phone numbers and emails
    * with per-row redaction counts, the compliance pass every
    * training-data pipeline runs before release. The testdata carries no
    * real PII, so the contact string is SYNTHESIZED deterministically
    * from customer columns (the q20/q28 precedent: derive the payload,
    * then make the engine prove the operator on it); the oracle composes
    * the identical string and must agree on every replacement and count.
    *
    * 100 TB shape: pure per-row map work inside whole-stage codegen —
    * no shuffle, no UDF; regexp_replace streams through the scan. */
  def q55PiiScrub(s: SparkSession, d: String): DataFrame = {
    val ph = concat(
      lpad((col("c_custkey") % 900 + 100).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    val em = concat(lower(col("c_name")), lit("@example.com"))
    val txt = concat(lit("reach "), col("c_name"), lit(" at "), ph,
      lit(" or "), em, lit(" about "), col("c_mktsegment"))
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val emailRe = "[a-z0-9#._-]+@[a-z]+\\.[a-z]+"
    customer(s, d).select(
        col("c_custkey"),
        regexp_replace(regexp_replace(txt, phoneRe, "[PHONE]"),
          emailRe, "[EMAIL]").as("scrubbed"),
        (size(split(txt, phoneRe, -1)) - 1).cast("long").as("n_phones"),
        (size(split(txt, emailRe, -1)) - 1).cast("long").as("n_emails"))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_pii_scrub"         -> (q55PiiScrub _),
    "q45_shipping_priority" -> (q45ShippingPriority _),
    "q46_local_supplier"    -> (q46LocalSupplier _),
    "q47_priority_check"    -> (q47OrderPriorityCheck _),
    "q18_cube"             -> (q18Cube _),
    "q19_percentiles"      -> (q19Percentiles _),
    "q01_pricing_summary"  -> (q01PricingSummary _),
    "q02_top_revenue"      -> (q02TopRevenueOrders _),
    "q03_revenue_by_nation"-> (q03RevenueByNation _),
    "q04_brand_stats"      -> (q04BrandStats _),
    "q05_window_lag"       -> (q05WindowLag _),
    "q06_set_ops"          -> (q06SetOps _),
    "q07_rollup"           -> (q07Rollup _),
    "q08_keyset_page"      -> (q08KeysetPage _),
    "q09_semi_anti"        -> (q09SemiAnti _),
    "q10_distinct"         -> (q10Distinct _),
    "q11_above_avg"        -> (q11AboveAvg _),
    "q12_event_pivot"      -> (q12EventPivot _),
    "q70_window_zoo"       -> (q70WindowZoo _),
    "q71_unpivot"          -> (q71Unpivot _),
  )

  val oracle: Map[String, String] = Map(
    "q70_window_zoo" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ntile(10) OVER w AS BIGINT) AS tile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(dense_rank() OVER w AS BIGINT) AS dr,
        |  nth_value(o_orderkey, 3) OVER
        |    (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q71_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |  FROM events GROUP BY user_id)
        |SELECT user_id, metric, n FROM (
        |  SELECT user_id, 'n_purchase' AS metric, n_purchase AS n FROM wide
        |  UNION ALL SELECT user_id, 'n_click', n_click FROM wide
        |  UNION ALL SELECT user_id, 'n_error', n_error FROM wide)
        |ORDER BY user_id, metric""".stripMargin,
    "q55_pii_scrub" ->
      """WITH t AS (SELECT c_custkey,
        |  'reach ' || c_name || ' at ' ||
        |  lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |  ' or ' || lower(c_name) || '@example.com about ' || c_mktsegment AS txt
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(txt,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
        |    '[a-z0-9#._-]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g') AS scrubbed,
        |  CAST(len(string_split_regex(txt,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) - 1 AS BIGINT) AS n_phones,
        |  CAST(len(string_split_regex(txt,
        |    '[a-z0-9#._-]+@[a-z]+\.[a-z]+')) - 1 AS BIGINT) AS n_emails
        |FROM t ORDER BY c_custkey""".stripMargin,
    "q45_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q46_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q47_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q18_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q19_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_revenue" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q03_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_brand_stats" ->
      """SELECT p_brand, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q05_window_lag" ->
      """SELECT user_id,
        |  ROW_NUMBER() OVER w AS rn, event_id,
        |  LAG(event_id, 1) OVER w AS prev_event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin,
    "q06_set_ops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, 'both' AS op FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS op FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT nationkey, 'supp_only' AS op FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
        |ORDER BY op, nationkey""".stripMargin,
    "q07_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q08_keyset_page" ->
      """SELECT * FROM orders WHERE o_orderkey > 1000
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q09_semi_anti" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers, TRUE AS has_orders
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |UNION ALL
        |SELECT c_nationkey, COUNT(*) AS n_customers, FALSE AS has_orders
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey, has_orders""".stripMargin,
    "q10_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_above_avg" ->
      """WITH a AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price FROM orders)
        |SELECT o_orderstatus, COUNT(*) AS n_above, MAX(o_totalprice) AS max_price
        |FROM orders, a WHERE o_totalprice > avg_price
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_event_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
