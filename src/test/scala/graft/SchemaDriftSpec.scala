package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The round-6 failure mode, pinned: the driver regenerated events.ts as
  * TIMESTAMP(MICROS) and 12 queries died at analysis under a
  * nanos-as-long assumption. `Tables.events` must normalize EITHER
  * physical encoding to the canonical `ts_us` micros long, and
  * `Tables.validate` must turn any future re-typing into one labeled
  * failure instead of N opaque analysis errors.
  */
class SchemaDriftSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("schema_drift").toString

  test("events normalizes TIMESTAMP(MICROS) ts to ts_us micros long") {
    val dir = tmp()
    import spark.implicits._
    Seq((1L, 5L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(1723500000123456L)))
      .write.parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(!out.columns.contains("ts"))
    val row = out.select(col("ts_us")).head
    assert(row.getLong(0) == 1723500000123456L)
  }

  test("events normalizes nanos-as-long ts to the same ts_us") {
    val dir = tmp()
    import spark.implicits._
    // TIMESTAMP(NANOS) parquet is not writable from Spark; the
    // nanosAsLong escape hatch surfaces it as a plain long, which is
    // exactly what a raw long column also reads as — same loader path.
    Seq((1L, 5L, "click", 1.5, "{}", 1723500000123456789L))
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")
      .write.parquet(s"$dir/events.parquet")
    val row = Tables.events(spark, dir).select(col("ts_us")).head
    assert(row.getLong(0) == 1723500000123456L) // truncated, not rounded
  }

  test("both encodings produce identical query results (q17 shape)") {
    import spark.implicits._
    // fixed-seed spread over the representable range: epoch, sub-second,
    // 2024-era instants, and the far future (year ~2262, the int64-nanos
    // ceiling) — every value whole-micros, as the generator emits
    val rng = new scala.util.Random(20260813L)
    val micros = Seq((1L, 5L, 0L), (2L, 5L, 123456L),
      (3L, 9L, 9223372036854775L)) ++
      (4L until 504L).map { i =>
        (i, i % 17, math.abs(rng.nextLong()) % 9223372036854775L)
      }
    val dirA = tmp()
    micros.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"),
        timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$dirA/events.parquet")
    val dirB = tmp()
    micros.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"),
        (col("us") * 1000).as("ts"))
      .write.parquet(s"$dirB/events.parquet")
    val a = graft.queries.Streams.q17LastSeen(spark, dirA).collect().toSeq
    val b = graft.queries.Streams.q17LastSeen(spark, dirB).collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(2)).sum == 503) // n_messages covers every row
  }

  test("an unknown ts encoding fails with the labeled message") {
    val dir = tmp()
    import spark.implicits._
    Seq((1L, 5L, "click", 1.5, "{}", "not-a-time"))
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("testdata schema changed"))
    assert(e.getMessage.contains("events.ts"))
  }

  test("validate passes on the real testdata") {
    Tables.validate(spark, "/root/testdata/sf0.001")
  }

  /** sf0.001 tables with `events` replaced by an arbitrary transform. */
  private def fixtureWith(eventsTransform: org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.DataFrame): String = {
    val dir = tmp()
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.parquet(s"$dir/$t.parquet")
    }
    eventsTransform(spark.read.parquet(s"$src/events.parquet"))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("validate reports a deliberately re-typed fixture with table.column") {
    val dir = fixtureWith(_.withColumn("value", col("value").cast("string")))
    val e = intercept[IllegalStateException](Tables.validate(spark, dir))
    assert(e.getMessage.contains("testdata schema changed"))
    assert(e.getMessage.contains("events.value"))
  }

  test("validate flags an int64 ts whose magnitude is micros, not nanos") {
    // a bare INT64 micros column is schema-identical to the
    // nanos-as-long read — only the value magnitude can tell them
    // apart, and dividing micros by 1000 would silently skew every
    // timestamp 1000x
    val dir = fixtureWith(_.withColumn("ts", unix_micros(col("ts"))))
    val e = intercept[IllegalStateException](Tables.validate(spark, dir))
    assert(e.getMessage.contains("not nanos-since-epoch"), e.getMessage)
  }

  test("validate flags a MIXED-unit int64 ts (max alone would pass it)") {
    // mostly nanos plus one raw-micros segment: max(ts) is plausible
    // nanos, so only the min-bound check labels the skewed rows that
    // would otherwise silently divide to 1000x-too-small timestamps
    val dir = fixtureWith(df => df.withColumn("ts",
      when(col("event_id") % 97 === 0, unix_micros(col("ts")))
        .otherwise(unix_micros(col("ts")) * 1000L)))
    val e = intercept[IllegalStateException](Tables.validate(spark, dir))
    assert(e.getMessage.contains("not nanos-since-epoch"), e.getMessage)
  }

  test("validate passes a ZERO-ROW int64-ts events table (no values to misread)") {
    // max/min over an empty table are NULL — the value guard must treat
    // that as "nothing to check", not throw NPE into a blanket catch
    // that silently disables the tripwire
    val dir = fixtureWith(df =>
      df.withColumn("ts", unix_micros(col("ts")) * 1000L)
        .filter(lit(false)))
    Tables.validate(spark, dir)
  }

  test("validate flags sub-microsecond precision in an int64 nanos ts") {
    // ties under the canonical micros contract would order differently
    // than full-precision oracles — fail labeled instead of drifting
    val dir = fixtureWith(_.withColumn("ts",
      unix_micros(col("ts")) * 1000L + 789L))
    val e = intercept[IllegalStateException](Tables.validate(spark, dir))
    assert(e.getMessage.contains("sub-microsecond"), e.getMessage)
  }
}
