package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-shaped operators in their batch-queryable form (SURVEY §2.9
  * streaming windows + §2.5 F7/F9). The same window programs run under
  * readStream with a watermark (StreamingSpec); here they are
  * oracle-checked against DuckDB on the events table.
  *
  * Event time arrives pre-normalized: `Tables.events` folds whatever
  * physical encoding the driver generated (nanos-as-long or
  * TIMESTAMP(MICROS)) into one canonical `ts_us` micros-since-epoch
  * long — the same truncation DuckDB's `epoch_us(ts)` applies on the
  * oracle side.
  */
object Streams {

  private def eventTime = timestamp_micros(col("ts_us"))

  /** q13: tumbling event-time window aggregation (the
    * `withWatermark + window()` shape, SURVEY §2.9). */
  def q13TumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("event_ts", eventTime)
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** q14: session windows — 30-minute gap sessionization per user
    * (`session_window` operator; end = last event + gap). */
  def q14SessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("event_ts", eventTime)
      .groupBy(session_window(col("event_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** q15: F9 config fan-out — the orchestrator's one-collector-per-CSV-
    * gateway explode (Orchestrator.py:279-291), synthesized from supplier
    * names. */
  def q15ConfigFanout(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .withColumn("gateway_csv",
        concat(col("s_name"), lit(","), col("s_name"), lit("-b")))
      .select(col("s_suppkey"),
        explode(split(col("gateway_csv"), ",")).as("gateway"))
      .orderBy(col("s_suppkey"), col("gateway"))

  /** The per-user event sequence order every changelog-shaped query keys
    * on (ts_us with event_id as the within-ts tiebreak). */
  private val seqW = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))

  /** Transition detection shared by q16 (changelog) and q77 (SCD2): keep
    * only rows whose event_type differs from the previous row's in seqW
    * order. ONE definition so an ordering/tiebreak change cannot silently
    * diverge between the changelog query and the interval builder. */
  private def transitions(ev: DataFrame): DataFrame =
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(seqW))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))

  /** q16: F7 status-change detection — emit only transitions (the
    * orchestrator's 5 s delta poll as a changelog query,
    * Orchestrator.py:88-135). */
  def q16StatusChanges(s: SparkSession, d: String): DataFrame =
    transitions(events(s, d))
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_id"))

  /** q17: F6 last_seen tracking — per-key max arrival time
    * (LoraServerIOCollector.py:400,448 etc., as the groupBy/max shape). */
  def q17LastSeen(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(max(eventTime).as("last_seen"), count(lit(1)).as("n_messages"))
      .orderBy(col("user_id"))

  /** q64: generic event-time AS-OF join — for every purchase, the most
    * recent strictly-earlier click by the same user (backward as-of,
    * the attribution join every event pipeline needs; the reference's
    * F2 pairing in q23 is the buffer-1 special case of this).
    *
    * Spark-first shape: NOT a point-in-interval join (which explodes
    * to O(clicks × purchases) per user) but union-tag + one window
    * over (user_id, ts) — a single hash-partitioned sort per side,
    * `last(_, ignoreNulls)` over rows [unbounded, -1 row]. At 100 TB
    * this is one shuffle on user_id, no candidate blow-up, and skewed
    * users degrade to a per-key sort instead of a cross product.
    * Strictly-earlier tie-break is the total order (ts, event_id). */
  def q64AsofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("click_ts",
        when(col("event_type") === "click", eventTime))
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), eventTime.as("purchase_ts"),
        col("last_click_id"), col("last_click_ts"))
      .orderBy(col("event_id"))
  }

  /** q65: banded RANGE join — all event pairs within 5 s of each other,
    * with NO equi key to hang the join on (the θ-join Spark would
    * otherwise plan as a broadcast nested loop over N² pairs).
    *
    * Scale shape: bucket the time axis at the range radius
    * (5 s → bucket = ts_us div 5e6 µs); a qualifying pair differs by ≤ 1
    * bucket, so exploding ONE side to its 3 neighboring buckets turns
    * the θ-join into an equi-join on the other side's home bucket —
    * shuffle-bounded, 3× duplication of one side, no quadratic scan.
    * Each pair matches exactly once (the right row's home bucket is
    * unique), so no distinct is needed. A hot 5 s bucket is the skew
    * case: salt that bucket or shrink the band. */
  def q65RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bandUs = 5000000L
    val e = events(s, d)
      .select(col("event_id"), col("ts_us"))
    val probe = e.select(col("event_id").as("event_a"), col("ts_us").as("ts_a"),
      explode(array(expr(s"ts_us div $bandUs") - 1, expr(s"ts_us div $bandUs"),
        expr(s"ts_us div $bandUs") + 1)).as("bucket"))
    val build = e.select(col("event_id").as("event_b"), col("ts_us").as("ts_b"),
      expr(s"ts_us div $bandUs").as("bucket"))
    probe.join(build,
        probe("bucket") === build("bucket") &&
          col("event_a") < col("event_b") &&
          abs(col("ts_b") - col("ts_a")) <= bandUs)
      .select(col("event_a"), col("event_b"),
        abs(col("ts_b") - col("ts_a")).as("gap_us"))
      .orderBy(col("event_a"), col("event_b"))
  }

  /** q67: approximate distinct counting via the [[graft.functions.HllDistinct]]
    * HyperLogLog sketch aggregate — distinct active user-days per event
    * type, sketched next to the exact count. At 100 TB the sketch is the
    * only viable shape: 4 KB of mergeable state per group and one
    * map-side-combinable pass, versus exact distinct's Expand + double
    * aggregate over every distinct value. The md5-derived hash makes the
    * sketch registers integer-exact across engines, so the ORACLE
    * recomputes the sketch itself in SQL (v_empty + fixed-point register
    * sum hash-compare bit-identically); estimate accuracy (~1.6% at
    * p=12) is pinned by HllDistinctSpec.
    *
    * Output contract: the fixed-point sum ranges up to m·2^53 = 2^65,
    * past int64 — emitted as DECIMAL(38,0) it survives both engines but
    * not every harness decimal normalizer, so it crosses the gate as two
    * int64-safe columns `s_hi = Σ div 2^32` (< 2^33) and
    * `s_lo = Σ mod 2^32`, losslessly reconstructible. */
  def q67ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    val key = concat(col("user_id").cast("string"), lit(":"),
      expr("ts_us div 86400000000").cast("string"))
    events(s, d)
      .withColumn("k", key)
      .groupBy(col("event_type"))
      .agg(graft.functions.GraftFunctions.hllDistinct(col("k")).as("sk"),
        countDistinct(col("k")).as("n_exact"))
      .select(col("event_type"), col("sk.v_empty").as("v_empty"),
        expr("CAST(sk.s_fixed DIV 4294967296 AS BIGINT)").as("s_hi"),
        expr("CAST(sk.s_fixed % 4294967296 AS BIGINT)").as("s_lo"),
        col("n_exact"))
      .orderBy(col("event_type"))
  }

  /** q68: semi-structured extraction through Spark 4's VARIANT type —
    * `parse_json` once into the binary variant encoding, then typed
    * path extraction (`variant_get`) inside the aggregate. The modern
    * schema-on-read path for a 100 TB event stream whose `props` blob
    * drifts: unlike `from_json` there is no fixed StructType to
    * mis-declare, unlike per-access `get_json_object` the JSON text is
    * parsed ONCE (variant re-access is byte-offset navigation, not
    * re-parsing), and missing paths are clean NULLs (n_missing pins
    * that semantics). */
  def q68VariantExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("v", parse_json(col("props")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("variant_get(v, '$.k', 'long')")).as("sum_k"),
        max(expr("variant_get(v, '$.k', 'long')")).as("max_k"),
        count(expr("variant_get(v, '$.missing', 'long')")).as("n_missing"))
      .orderBy(col("event_type"))

  /** q69: conversion funnel — for every purchase, did a click precede it
    * within 2 hours, and did a view precede THAT click within 2 hours
    * (the view→click→purchase sequence-matching op of event
    * analytics; Spark has no MATCH_RECOGNIZE, so the funnel composes
    * from the q64 as-of technique).
    *
    * Two chained ignore-nulls windows over ONE (user_id, ts) sort — no
    * joins at all: pass 1 annotates every row with its running last-view
    * time; pass 2 carries `struct(click_ts, click's last-view)` through
    * a second last() — the STRUCT is the correctness point: the click
    * time and that same click's view time travel together, so a click
    * with no prior view cannot borrow an older click's view. Same
    * partitioning for both passes → Catalyst plans one shuffle + one
    * sort, two Window operators on top. */
  def q69Funnel(s: SparkSession, d: String): DataFrame = {
    val stepUs = 7200000000L // 2 h (matched to the synthetic stream sparsity)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
    val withView = base.withColumn("last_view_ts",
      last(when(col("event_type") === "view", col("ts_us")), ignoreNulls = true).over(w))
    val withClick = withView.withColumn("lc",
      last(when(col("event_type") === "click",
        struct(col("ts_us").as("cts"), col("last_view_ts").as("lv"))),
        ignoreNulls = true).over(w))
    withClick
      .filter(col("event_type") === "purchase")
      .withColumn("has_click",
        coalesce(col("ts_us") - col("lc.cts") <= stepUs, lit(false)))
      .withColumn("full_funnel",
        coalesce(col("ts_us") - col("lc.cts") <= stepUs &&
          col("lc.cts") - col("lc.lv") <= stepUs, lit(false)))
      .select(col("event_id"), col("user_id"), col("has_click"), col("full_funnel"))
      .orderBy(col("event_id"))
  }

  /** q74: the custom whole-operator AS-OF join
    * ([[graft.plans.AsOfJoinPlan]] → AsOfJoinExec, planned via the
    * injected strategy) on the same attribution question as q64 — for
    * every purchase, the latest click at-or-before it (inclusive,
    * (ts, event_id) tiebreak). Same single-shuffle-per-side cost as a
    * sort-merge join with O(1) merge state, vs q64's union+window
    * composition. The oracle is an independent correlated-subquery
    * statement of the semantics, so the custom exec's merge loop is
    * driver-gate-verified, not just spec-verified. */
  def q74AsofCustom(s: SparkSession, d: String): DataFrame = {
    val purchases = events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_ts"))
    val clicks = events(s, d).filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_ts"))
    graft.plans.AsOfJoin(s, purchases, clicks,
        "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .select(col("p_id"), col("p_user"), col("p_ts"),
        col("c_id").as("last_click_id"), col("c_ts").as("last_click_ts"))
      .orderBy(col("p_id"))
  }

  /** q77: SCD2 reconstruction — turn the event CHANGELOG into the
    * interval dimension table (type-2 slowly-changing dimension): one
    * row per (user, status) EPISODE with [valid_from, valid_to), open
    * episodes carrying a null valid_to. Transitions only (q16's filter)
    * then one lead() over the surviving rows — same single (user, ts)
    * shuffle as the changelog query; the inverse direction of q74's
    * as-of lookup (SCD2 builds the intervals, as-of probes them). */
  def q77Scd2(s: SparkSession, d: String): DataFrame =
    transitions(events(s, d))
      .withColumn("valid_to", lead(col("ts_us"), 1).over(seqW))
      .select(col("user_id"), col("event_type").as("status"),
        col("ts_us").as("valid_from"), col("valid_to"))
      // status AND valid_to in the sort key: transitions of one user at
      // the same ts_us share a valid_from, and with ≥3 of them the status
      // repeats too (A→B→A all at ts T emits two (T, A) episodes with
      // DIFFERENT valid_to), so (user_id, valid_from, status) alone is
      // not total — the suite's determinism rule. With valid_to appended
      // any remaining tie is a full-row duplicate, which no row order can
      // distinguish. valid_to is null for open episodes: nulls-first
      // explicitly, matching the oracle's NULLS FIRST (DuckDB defaults
      // NULLS LAST where Spark asc defaults nulls-first).
      .orderBy(col("user_id"), col("valid_from"), col("status"),
        col("valid_to").asc_nulls_first)

  /** q86: cohort retention — the user-lifecycle table every product
    * analytics stack computes: users grouped by first-active week
    * (cohort), counted per week-offset they return. Two aggregations
    * on the same user_id partitioning (first-touch, then activity
    * join); integer week arithmetic so the oracle is exact. */
  def q86CohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"),
      expr("ts_us div 604800000000").as("week"))
    val firstWeek = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    ev.join(firstWeek, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** q87: hourly anomaly detection — flag hours whose event count sits
    * more than 3 standard deviations from the trailing-24-observation
    * mean, per event type. The z-test is ALL-INTEGER: with s1 = Σx,
    * s2 = Σx², n the trailing count, z² = (cnt·n − s1)²/(s2·n − s1²),
    * so |z| > 3 ⟺ (cnt·n − s1)² > 9·(s2·n − s1²) — no floating-point
    * mean or σ ever exists to diverge between engines. EVERY term,
    * including the s2 = Σx² accumulation itself, runs in 128-bit-exact
    * arithmetic on BOTH sides (Spark decimal(38,0) ≙ DuckDB HUGEINT):
    * in BIGINT, dev² overflows once one (type, hour) bucket passes
    * ~1.3e8 events — a rate the 100 TB corpus this query targets
    * actually reaches — and a BIGINT Σx² overflows at ~6.2e8/hour;
    * decimal pushes both bounds past 1e17 events/hour. s2 exceeds int64
    * range well before the z-test does, so (q67's precedent: harness
    * decimal normalizers are lossy) it crosses the gate as two
    * int64-safe 2^62-limb columns s2_hi/s2_lo, losslessly
    * reconstructible as s2 = s2_hi·2^62 + s2_lo. One window pass over
    * (type, hour); the same program runs streaming as a windowed agg +
    * stateful threshold. */
  def q87HourlyAnomaly(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    def big(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val dev = big(col("cnt")) * big(col("n")) - big(col("s1"))
    events(s, d)
      .select(col("event_type"), expr("ts_us div 3600000000").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("s1", sum(col("cnt")).over(w))
      .withColumn("s2", sum(big(col("cnt")) * big(col("cnt"))).over(w))
      .withColumn("n", count(col("cnt")).over(w))
      .filter(col("n") === 24)
      .withColumn("is_anomaly",
        dev * dev > lit(9L) * (col("s2") * big(col("n")) - big(col("s1")) * big(col("s1"))))
      .select(col("event_type"), col("hour"), col("cnt"), col("s1"),
        expr("CAST(s2 DIV 4611686018427387904 AS BIGINT)").as("s2_hi"),
        expr("CAST(s2 % 4611686018427387904 AS BIGINT)").as("s2_lo"),
        col("is_anomaly"))
      .orderBy(col("event_type"), col("hour"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_cohort_retention" -> (q86CohortRetention _),
    "q87_hourly_anomaly"  -> (q87HourlyAnomaly _),
    "q77_scd2"            -> (q77Scd2 _),
    "q74_asof_custom"     -> (q74AsofCustom _),
    "q13_tumbling_window" -> (q13TumblingWindow _),
    "q64_asof_join"       -> (q64AsofJoin _),
    "q65_range_join"      -> (q65RangeJoin _),
    "q67_approx_distinct" -> (q67ApproxDistinct _),
    "q68_variant_extract" -> (q68VariantExtract _),
    "q69_funnel"          -> (q69Funnel _),
    "q17_last_seen"       -> (q17LastSeen _),
    "q14_session_window"  -> (q14SessionWindow _),
    "q15_config_fanout"   -> (q15ConfigFanout _),
    "q16_status_changes"  -> (q16StatusChanges _),
  )

  val oracle: Map[String, String] = Map(
    "q86_cohort_retention" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |f AS (SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY user_id)
        |SELECT cohort, week - cohort AS week_offset,
        |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active
        |FROM ev JOIN f USING (user_id)
        |GROUP BY cohort, week - cohort
        |ORDER BY cohort, week_offset""".stripMargin,
    "q87_hourly_anomaly" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hour, cnt,
        |    SUM(cnt) OVER tw AS s1,
        |    SUM(CAST(cnt AS HUGEINT) * cnt) OVER tw AS s2,
        |    COUNT(cnt) OVER tw AS n
        |  FROM h
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, cnt,
        |  CAST(s1 AS BIGINT) AS s1,
        |  CAST(s2 // 4611686018427387904 AS BIGINT) AS s2_hi,
        |  CAST(s2 % 4611686018427387904 AS BIGINT) AS s2_lo,
        |  (CAST(cnt AS HUGEINT) * n - s1) * (CAST(cnt AS HUGEINT) * n - s1)
        |    > 9 * (s2 * n - CAST(s1 AS HUGEINT) * s1) AS is_anomaly
        |FROM w WHERE n = 24
        |ORDER BY event_type, hour""".stripMargin,
    "q77_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |t AS (SELECT *, LAG(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e),
        |f AS (SELECT * FROM t
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |i AS (SELECT user_id, event_type AS status, ts_us AS valid_from,
        |    LEAD(ts_us) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
        |  FROM f)
        |SELECT user_id, status, valid_from, valid_to FROM i
        |ORDER BY user_id, valid_from, status, valid_to NULLS FIRST""".stripMargin,
    "q74_asof_custom" ->
      """WITH p AS (SELECT event_id AS p_id, user_id AS p_user,
        |    epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user,
        |    epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click')
        |SELECT p_id, p_user, p_ts,
        |  (SELECT c_id FROM c WHERE c_user = p_user AND c_ts <= p_ts
        |   ORDER BY c_ts DESC, c_id DESC LIMIT 1) AS last_click_id,
        |  (SELECT c_ts FROM c WHERE c_user = p_user AND c_ts <= p_ts
        |   ORDER BY c_ts DESC, c_id DESC LIMIT 1) AS last_click_ts
        |FROM p ORDER BY p_id""".stripMargin,
    "q69_funnel" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (
        |  SELECT *, last_value(CASE WHEN event_type = 'view' THEN ts_us END
        |      IGNORE NULLS) OVER w AS last_view_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |c AS (
        |  SELECT *, last_value(CASE WHEN event_type = 'click'
        |      THEN struct_pack(cts := ts_us, lv := last_view_ts) END
        |      IGNORE NULLS) OVER w AS lc
        |  FROM v
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id,
        |  COALESCE(ts_us - (lc).cts <= 7200000000, FALSE) AS has_click,
        |  COALESCE(ts_us - (lc).cts <= 7200000000
        |    AND (lc).cts - (lc).lv <= 7200000000, FALSE) AS full_funnel
        |FROM c WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q68_variant_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT) AS n_missing
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q67_approx_distinct" ->
      """WITH k AS (
        |  SELECT event_type,
        |    CAST(user_id AS VARCHAR) || ':' ||
        |      CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS k
        |  FROM events),
        |h AS (SELECT event_type,
        |    ('0x' || substring(md5(k), 1, 16))::UBIGINT AS hv FROM k),
        |r AS (SELECT event_type, hv >> 52 AS reg,
        |    MAX(CASE WHEN hv % 4503599627370496 = 0 THEN 53
        |         ELSE 53 - length(bin(hv % 4503599627370496)) END) AS m
        |  FROM h GROUP BY 1, 2),
        |agg AS (SELECT event_type,
        |    CAST(4096 - COUNT(*) AS BIGINT) AS v_empty,
        |    SUM(CAST(CAST(1 AS BIGINT) << (53 - m) AS HUGEINT))
        |      + CAST(4096 - COUNT(*) AS HUGEINT) * (CAST(1 AS HUGEINT) << 53)
        |      AS s_sum
        |  FROM r GROUP BY 1),
        |x AS (SELECT event_type, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact
        |  FROM k GROUP BY 1)
        |SELECT a.event_type, v_empty,
        |  CAST(s_sum // 4294967296 AS BIGINT) AS s_hi,
        |  CAST(s_sum % 4294967296 AS BIGINT) AS s_lo, n_exact
        |FROM agg a JOIN x USING (event_type) ORDER BY event_type""".stripMargin,
    "q64_asof_join" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |    CASE WHEN event_type = 'click' THEN ts END AS click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *,
        |    last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
        |    last_value(click_ts IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM u)
        |SELECT event_id, user_id, ts AS purchase_ts, last_click_id, last_click_ts
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q65_range_join" ->
      """SELECT a.event_id AS event_a, b.event_id AS event_b,
        |  abs(epoch_us(b.ts) - epoch_us(a.ts)) AS gap_us
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        |  AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 5000000
        |ORDER BY event_a, event_b""".stripMargin,
    "q17_last_seen" ->
      """SELECT user_id, MAX(ts) AS last_seen, COUNT(*) AS n_messages
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q13_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q14_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >
        |              INTERVAL 30 MINUTE OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q15_config_fanout" ->
      """SELECT s_suppkey, unnest(string_split(s_name || ',' || s_name || '-b', ',')) AS gateway
        |FROM supplier ORDER BY s_suppkey, gateway""".stripMargin,
    "q16_status_changes" ->
      """WITH x AS (SELECT user_id, event_id, event_type, ts,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT user_id, event_id, event_type FROM x
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
