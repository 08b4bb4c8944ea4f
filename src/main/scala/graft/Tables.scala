package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated TESTDATA parquet tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and loads
  * tables through here so that filter pushdown / column pruning reach the
  * parquet scan — no caching layer hides the scan from Catalyst.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The driver has generated events.ts under two physical encodings
    // across rounds: TIMESTAMP(NANOS) (readable only via nanosAsLong)
    // and TIMESTAMP(MICROS). Enable the nanos escape hatch AND pin
    // int64 timestamps to TimestampType (not TIMESTAMP_NTZ) so the
    // micros encoding reads as raw micros-since-epoch internally —
    // `events` below then normalizes either encoding to one contract.
    // Set once per session; harmless for the other tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The events stream table with `ts` normalized to ONE canonical
    * column: `ts_us`, micros-since-epoch as a long — the truncation
    * DuckDB's `epoch_us(ts)` applies on its side of the oracle gate,
    * whatever the physical encoding. Raw `ts` is dropped so no query
    * can silently depend on an encoding-specific type again (round 6:
    * 12 queries died at analysis when the driver regenerated the
    * parquet as TIMESTAMP(MICROS) under a nanos-as-long assumption).
    *
    * Encodings handled:
    *  - long            → TIMESTAMP(NANOS) via nanosAsLong: `ts div 1000`
    *  - timestamp       → TIMESTAMP(MICROS): `unix_micros` (raw internal
    *                      micros; int64 parquet timestamps are never
    *                      tz-adjusted on read)
    *  - timestamp_ntz   → as above after a cast (UTC sessions only —
    *                      every entry point sets spark.sql.session.timeZone=UTC)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    val tsUs = df.schema("ts").dataType match {
      case LongType           => expr("ts div 1000")
      case TimestampType      => unix_micros(col("ts"))
      case TimestampNTZType   => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"testdata schema changed: events.ts is now $other " +
          "(expected TIMESTAMP(NANOS)-as-long, TIMESTAMP, or TIMESTAMP_NTZ) " +
          "— teach Tables.events the new encoding")
    }
    df.withColumn("ts_us", tsUs.cast(LongType)).drop("ts")
  }

  /** Schema-drift tripwire (VERDICT r6 #2): assert every table still
    * carries the columns/types the engine's queries assume, and fail
    * with ONE labeled message instead of N opaque analysis errors when
    * the driver regenerates testdata under a new encoding. Run by
    * Verify and Bench before any query.
    *
    * Type cells are the EXPECTED Catalyst types after `table()`'s
    * reader flags; a set means any member is acceptable (and the
    * loader is known to normalize the difference away).
    */
  def validate(s: SparkSession, d: String): Unit = {
    val ints: Set[DataType] = Set(LongType, IntegerType)
    val str: Set[DataType] = Set(StringType)
    val dbl: Set[DataType] = Set(DoubleType)
    // date columns are compared against 'yyyy-MM-dd' literals; either a
    // DATE or a TIMESTAMP encoding keeps those comparisons well-typed
    val dateish: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
    val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
      "region" -> Seq("r_regionkey" -> ints, "r_name" -> str),
      "nation" -> Seq("n_nationkey" -> ints, "n_regionkey" -> ints,
        "n_name" -> str),
      "customer" -> Seq("c_custkey" -> ints, "c_name" -> str,
        "c_nationkey" -> ints, "c_acctbal" -> dbl, "c_mktsegment" -> str),
      "supplier" -> Seq("s_suppkey" -> ints, "s_name" -> str,
        "s_nationkey" -> ints, "s_acctbal" -> dbl),
      "part" -> Seq("p_partkey" -> ints, "p_name" -> str, "p_brand" -> str,
        "p_type" -> str, "p_size" -> ints, "p_retailprice" -> dbl),
      "orders" -> Seq("o_orderkey" -> ints, "o_custkey" -> ints,
        "o_orderstatus" -> str, "o_totalprice" -> dbl,
        "o_orderdate" -> dateish, "o_orderpriority" -> str),
      "lineitem" -> Seq("l_orderkey" -> ints, "l_partkey" -> ints,
        "l_suppkey" -> ints, "l_linenumber" -> ints, "l_quantity" -> dbl,
        "l_extendedprice" -> dbl, "l_discount" -> dbl, "l_tax" -> dbl,
        "l_returnflag" -> str, "l_linestatus" -> str,
        "l_shipdate" -> dateish),
      "events" -> Seq("event_id" -> ints, "user_id" -> ints,
        "event_type" -> str, "value" -> dbl, "props" -> str,
        // the encodings Tables.events normalizes (NTZ folds into
        // TimestampType under table()'s reader flags)
        "ts" -> Set[DataType](LongType, TimestampType, TimestampNTZType)),
      "documents" -> Seq("doc_id" -> ints, "text" -> str, "lang" -> str,
        "source" -> str, "n_chars" -> ints),
      "embeddings" -> Seq("vec_id" -> ints, "label" -> ints,
        // FLOAT only, deliberately: the vector kernels (DotProductF,
        // SrpSig) and q37's Dataset encoder are ARRAY<FLOAT>-typed, and
        // a loader-side double→float cast would TRUNCATE while the
        // DuckDB oracles read the same parquet at full double
        // precision — silent hash divergence instead of a labeled
        // failure. If the driver ever regenerates embeddings as
        // ARRAY<DOUBLE>, this trips with ONE message and the loader +
        // kernels + oracles get extended together, not patched here.
        "embedding" -> Set[DataType](ArrayType(FloatType, true),
          ArrayType(FloatType, false))))
    val problems = expected.flatMap { case (t, cols) =>
      try {
        val byName = table(s, d, t).schema.fields
          .map(f => f.name -> f.dataType).toMap
        cols.flatMap { case (c, ok) =>
          byName.get(c) match {
            case None =>
              Some(s"$t.$c missing (have: ${byName.keys.toSeq.sorted.mkString(", ")})")
            case Some(dt) if !ok.contains(dt) =>
              Some(s"$t.$c is now $dt (expected one of ${ok.mkString("/")})")
            case _ => None
          }
        }
      } catch {
        case e: Throwable => Seq(s"table $t unreadable at $d: ${e.getMessage}")
      }
    } ++ eventsTsValueProblems(s, d)
    if (problems.nonEmpty) fail(problems.mkString("; "))
  }

  /** Value-level guards the schema can't express, for the int64 ts
    * path (a bare INT64 column is indistinguishable from the
    * nanos-as-long read of TIMESTAMP(NANOS), so `events` would happily
    * `div 1000` raw micros or seconds — a silent 1000×/10⁶× skew):
    *  - magnitude: nanos-since-epoch for this century sits in
    *    ~[1e18, 4.1e18]; the check's lower bound is deliberately the
    *    looser 1e17 (≈1973) so any plausible nanos clock passes, while
    *    micros (~1e15) and seconds (~1e9) stay orders of magnitude
    *    outside it — one max() labels the misread before any query
    *    runs;
    *  - residue: sub-microsecond precision (ts % 1000 ≠ 0) cannot
    *    survive the canonical micros contract — Spark would tie on
    *    ts_us where the DuckDB oracles still order by full-precision
    *    raw ts, silently diverging every window query. The generator
    *    has only ever emitted whole-micros nanos; if that changes,
    *    fail labeled rather than drift.
    * One aggregate over the single ts column — validate-time cost,
    * not query-time. */
  private def eventsTsValueProblems(s: SparkSession, d: String): Seq[String] = {
    // footer read only: if THIS fails, the schema loop above already
    // reported the unreadable table — swallowing here is correct
    val dfOpt =
      try Some(table(s, d, "events"))
      catch { case _: Throwable => None }
    dfOpt.toSeq.flatMap { df =>
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) => try {
          val r = df.agg(max(col("ts")).as("mx"), min(col("ts")).as("mn"),
            max(abs(col("ts") % 1000)).as("res")).head()
          if (r.isNullAt(0)) Nil // zero rows: no values to misread
          else {
          val mx = r.getLong(0)
          val mn = r.getLong(1)
          val res = r.getLong(2)
          // BOTH bounds: max alone would pass a MIXED-unit table (mostly
          // nanos plus one raw-micros segment) and the skewed rows would
          // silently divide to 1000x-too-small timestamps — exactly the
          // class this guard exists to label
          val magnitude =
            if (mx < 100000000000000000L || mx > 4102444800000000000L ||
                mn < 100000000000000000L)
              Seq(s"events.ts int64 range=[$mn, $mx] is not nanos-since-epoch " +
                "(all rows expected within ~[1e17, 4.1e18]) — raw " +
                "micros/seconds re-encoding, or a mixed-unit table? " +
                "teach Tables.events the new unit")
            else Nil
          val residue =
            if (res != 0L)
              Seq("events.ts carries sub-microsecond precision " +
                s"(max residue $res ns) — the canonical micros contract " +
                "(ts_us) would order ties differently than full-precision " +
                "oracles; extend the contract before running")
            else Nil
          magnitude ++ residue
          }
        } catch {
          // the footer was readable but the VALUES are not (data-page
          // corruption, etc.) — that was never "reported above"; a
          // silent Nil here would disable the tripwire exactly when the
          // table is broken
          case e: Throwable =>
            Seq("events.ts value guard could not read values (footer was " +
              s"readable): ${e.getClass.getName}: ${e.getMessage}")
        }
        case _ => Nil // timestamp encodings are micros-physical already
      }
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalStateException(s"testdata schema changed: $msg")

  private val rowGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]

  /** Whether the scan feeding `df` parallelizes to `width` NON-EMPTY
    * tasks on its own. TWO granularities must both suffice, and the
    * r13 review caught the gate checking only the first:
    *
    *  1. ROW GROUPS — the unit parquet hands to ONE task no matter how
    *     a file is split (r12 StageClock: every bench-SF table is one
    *     row group and the CPU-dense map families ran single-task at 3%
    *     utilization). Counted from the FOOTERS (exact; a byte estimate
    *     misreads precisely the single-row-group-despite-splitting
    *     case), short-circuited: ≥width files proves it without reads,
    *     and the walk stops at the first `width` row groups.
    *  2. BYTE PACKING — Spark packs files into scan partitions by
    *     `maxPartitionBytes` (+ openCostInBytes padding, ignored here —
    *     ignoring it only UNDERcounts partitions, the safe direction),
    *     so 32 × 2 MB files are ≥width row groups yet land in 1-2
    *     FilePartitions under the 128 MB default: total bytes must
    *     reach width × maxPartitionBytes before the packing can
    *     produce width partitions. The size walk stops once the bytes
    *     threshold is met.
    *
    * Both walks are memoized per (session, file set) and bounded (at
    * most `width` footer reads; file sizes come one listStatus per
    * parent directory, not one RPC per file). Any I/O failure counts
    * the file as ONE row group / zero bytes — plan construction never
    * dies on a vanished file (the scan itself will report it), and the
    * error lands on the err-toward-pinning side. */
  private def scanSelfParallel(df: DataFrame, width: Int): Boolean = {
    val s = df.sparkSession
    rowGroupMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    val files = df.inputFiles
    if (files.isEmpty) return false
    // maxPartitionBytes is part of the decision, so it keys the memo —
    // a session that retunes it (tests; an operator mid-session) must
    // not read a verdict computed under the old packing
    val maxPartBytes = s.sessionState.conf.filesMaxPartitionBytes
    val key = (s, files.sorted.mkString(" ") + s"#$width#$maxPartBytes")
    rowGroupMemo.computeIfAbsent(key, _ => {
      val conf = s.sessionState.newHadoopConf()
      val bytesNeeded = width.toLong * maxPartBytes
      // file sizes: one listStatus per parent dir (Spark's own listing
      // pattern), filtered to the scan's files — partition-pruned scans
      // must not count pruned siblings. Both sides normalize through
      // hadoop Path: inputFiles renders file:///x where FileStatus
      // renders file:/x, and a raw string set would match nothing
      val wanted = files.map(f =>
        new org.apache.hadoop.fs.Path(f).toString).toSet
      var totalBytes = 0L
      val parents = files.map(f =>
        new org.apache.hadoop.fs.Path(f).getParent).distinct
      val pit = parents.iterator
      while (pit.hasNext && totalBytes < bytesNeeded) {
        val dir = pit.next()
        try {
          val fs = dir.getFileSystem(conf)
          fs.listStatus(dir).foreach { st =>
            if (wanted.contains(st.getPath.toString)) totalBytes += st.getLen
          }
        } catch { case scala.util.control.NonFatal(_) => /* counts 0 */ }
      }
      totalBytes >= bytesNeeded && {
        var rg = 0L
        if (files.length >= width) rg = width.toLong
        val it = files.iterator
        while (it.hasNext && rg < width) {
          val p = new org.apache.hadoop.fs.Path(it.next())
          rg += (try {
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
            try r.getRowGroups.size.toLong finally r.close()
          } catch { case scala.util.control.NonFatal(_) => 1L })
        }
        rg >= width
      }
    })
  }

  /** Width pin for CPU-dense map pipelines, GATED on scan parallelism
    * (r12 ADVICE): repartition to session width only when the table's
    * estimated row groups cannot feed that many scan tasks — the
    * single-row-group regime where the r12 audit caught q40/q20/q21/q26
    * running whole codec pipelines as ONE task. Once the table carries
    * ≥width row groups (any real deployment: multi-row-group files,
    * many files) the scan parallelizes naturally and the pin withholds
    * itself — the plan is byte-identical to the unpinned one, so the
    * 100 TB path never pays the full-width exchange of the projection
    * (nor its sortBeforeRepartition local sort) that the r12
    * unconditional pin charged on an untested "stays noise" assumption.
    * `partitionExprs` empty → round-robin; otherwise hash on them. */
  def cpuWidthPin(df: DataFrame, partitionExprs: org.apache.spark.sql.Column*): DataFrame = {
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    if (scanSelfParallel(df, width)) df
    else if (partitionExprs.isEmpty) df.repartition(width)
    else df.repartition(width, partitionExprs: _*)
  }
}
