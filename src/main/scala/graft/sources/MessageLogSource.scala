package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch source over a captured message log — the replayable
  * shell shared by the reference's three transports (SURVEY §2.1 S1-S3:
  * MQTT / WebSocket / SSE all reduce to "append messages to a durable log;
  * the query reads the log"). Transport daemons write JSONL files into
  * `path`; this source turns files into exactly-once micro-batches.
  *
  * Record shape (one JSON object per line):
  * {{{
  *   {"topic": str|null, "message": str, "data_collector_id": long,
  *    "organization_id": long, "seq": long, "arrival_ts": epoch-micros long}
  * }}}
  *
  * Offsets are the count of files consumed from the lexicographically
  * sorted directory listing. WRITER CONTRACT (what a transport daemon
  * must do, and what EventsStreamTwinSpec demonstrates): a segment is
  * IMMUTABLE ONCE LISTABLE — write it outside the watched directory,
  * then move it in atomically; name segments monotonically (zero-padded
  * sequence numbers). Appending to an already-listed file is OUT of
  * contract: a micro-batch whose offset has passed that file will never
  * re-read it, so in-place appends would be silently lost — atomic
  * whole-file publish is what makes file-count offsets exactly-once.
  * The log is append-only at FILE granularity, never within a file.
  * Batch reads (replay/tests) see every file at once. One file = one
  * partition: scale ingest by sharding the writer across files.
  *
  * Scan pushdown (SURVEY §7.6 backlog 6c):
  *   - column pruning: the reader materializes ONLY the required
  *     columns — a metadata query (`select data_collector_id, count(*)`)
  *     never pays for the message bodies it immediately drops;
  *   - row-level filters: comparisons on the three id/seq longs and
  *     topic equality/nullness are evaluated during the line scan, so
  *     unreferenced rows are dropped before Spark ever sees them. All
  *     pushed filters are ALSO returned as post-scan residuals (the
  *     parquet row-group model): pushdown is an I/O saver, never the
  *     correctness gate;
  *   - segment pruning: the writer stamps `seq` from one increasing
  *     counter, so seq is STRICTLY increasing across the sorted file
  *     listing; a `seq` bound then prunes whole files from the scan by
  *     peeking each file's first record (the log-segment analog of a
  *     parquet footer min/max — one small read per segment at plan time,
  *     no data read for pruned segments). Row filters stay correct even
  *     if a writer violates the monotonicity contract; only the
  *     file-skip optimization relies on it.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.MessageLogSource")
  *     .load(dir)                       // streaming
  *   spark.read.format("graft.sources.MessageLogSource").load(dir)
  * }}}
  */
class MessageLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MessageLogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MessageLogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object MessageLogSource {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("message", StringType),
    StructField("data_collector_id", LongType),
    StructField("organization_id", LongType),
    StructField("seq", LongType),
    StructField("arrival_ts", TimestampType)))

  def listFiles(path: String): Array[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).sorted
  }

  /** Test hook: readers opened since the last reset (local-mode specs
    * assert segment pruning by counting opens; meaningless on a real
    * cluster where readers open in executor JVMs). */
  val readersOpened = new AtomicLong(0)

  /** The filters the reader can evaluate during the line scan. Numeric
    * comparisons cover the long columns; topic supports equality and
    * null tests (MQTT topic routing). arrival_ts is deliberately NOT
    * claimed: timestamp literals arrive tz-shaped and buy nothing over
    * the equivalent seq bound. */
  private[sources] def supported(f: Filter): Boolean = f match {
    case EqualTo(c, v) => longCol(c) && numeric(v) || c == "topic" && v.isInstanceOf[String]
    case GreaterThan(c, v)        => longCol(c) && numeric(v)
    case GreaterThanOrEqual(c, v) => longCol(c) && numeric(v)
    case LessThan(c, v)           => longCol(c) && numeric(v)
    case LessThanOrEqual(c, v)    => longCol(c) && numeric(v)
    case IsNull("topic") | IsNotNull("topic") => true
    case _ => false
  }
  private def longCol(c: String) =
    c == "seq" || c == "data_collector_id" || c == "organization_id"
  /** INTEGRAL values only: eval/seqBounds compare via longValue, which
    * TRUNCATES — accepting LessThan(seq, 5.5) would evaluate seq < 5
    * row-side and prune segments to hi = 4, silently dropping the
    * seq = 5 rows the true predicate matches (and the rows are gone
    * before Spark's residual filter could restore them). Catalyst's
    * UnwrapCastInBinaryComparison normally rewrites such predicates to
    * integral form before pushdown, but this contract must not depend
    * on an optimizer rule. Non-integral comparisons stay unpushed —
    * Spark evaluates them residually, correct just slower. */
  private def numeric(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => true
    // wider integral types must also FIT in a long — longValue silently
    // wraps past 2^63 (a wrapped bound inverts the comparison)
    case b: java.math.BigInteger => b.bitLength < 64
    case d: java.math.BigDecimal =>
      d.stripTrailingZeros.scale <= 0 &&
        (try { d.longValueExact(); true } catch { case _: ArithmeticException => false })
    case bd: scala.math.BigDecimal => bd.isWhole && bd.isValidLong
    case bi: scala.math.BigInt => bi.isValidLong
    case _ => false
  }

  private[sources] def eval(f: Filter, topic: String, dc: Long, org: Long,
                            seq: Long): Boolean = {
    def n(c: String): Long = c match {
      case "seq" => seq
      case "data_collector_id" => dc
      case _ => org
    }
    def v(x: Any): Long = x.asInstanceOf[Number].longValue
    f match {
      case EqualTo("topic", t)      => topic != null && topic == t
      case EqualTo(c, x)            => n(c) == v(x)
      case GreaterThan(c, x)        => n(c) > v(x)
      case GreaterThanOrEqual(c, x) => n(c) >= v(x)
      case LessThan(c, x)           => n(c) < v(x)
      case LessThanOrEqual(c, x)    => n(c) <= v(x)
      case IsNull("topic")          => topic == null
      case IsNotNull("topic")       => topic != null
      case _ => true
    }
  }

  /** [lower, upper] bound on `seq` implied by the pushed filters
    * (Long.Min/MaxValue when unbounded). */
  private[sources] def seqBounds(pushed: Array[Filter]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    pushed.foreach {
      case EqualTo("seq", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue)
      case GreaterThan("seq", v: Number) if v.longValue < Long.MaxValue =>
        lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("seq", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("seq", v: Number) if v.longValue > Long.MinValue =>
        hi = math.min(hi, v.longValue - 1)
      case LessThanOrEqual("seq", v: Number) => hi = math.min(hi, v.longValue)
      case _ => ()
    }
    (lo, hi)
  }

  // shared, thread-safe for readTree: a per-call ObjectMapper would be
  // constructed once per segment file on EVERY plan of a pruned scan
  private val planMapper = new ObjectMapper()

  /** First record's seq, or None when unreadable (empty segment, torn
    * write) — pruning then keeps the file: conservatism over I/O. */
  private[sources] def firstSeq(file: String): Option[Long] =
    try {
      val src = scala.io.Source.fromFile(file, "UTF-8")
      try src.getLines().buffered.headOption.flatMap { l =>
        val node = planMapper.readTree(l)
        if (node != null && node.hasNonNull("seq")) Some(node.get("seq").asLong)
        else None
      } finally src.close()
    } catch { case _: Throwable => None }

  /** Drop files that provably contain no seq in [lo, hi]: `seq` is one
    * writer counter, strictly increasing across the sorted listing, so
    * file i's seqs lie in [first_i, first_(i+1) - 1] (last file
    * unbounded above).
    *
    * The CROSS-FILE half of the premise is CHECKED, not assumed: if
    * the observed first-seqs are not strictly increasing across the
    * listing (a writer restart that reset its counter, a rotated file
    * sorting out of order), pruning is skipped entirely — residual row
    * filters stay correct but cannot resurrect rows in files that were
    * never opened, so a violated cross-file premise degrades to "read
    * everything". The WITHIN-file half (rows inside a segment carry
    * seqs in [first_i, first_(i+1))) is the single-counter writer
    * contract and is NOT cheaply checkable (an interior out-of-order
    * row is invisible to any endpoint peek); a writer broken in that
    * specific way could still lose rows to pruning — callers who
    * cannot trust their writer should not push seq bounds. */
  private[sources] def pruneBySeq(files: Array[String],
                                  pushed: Array[Filter]): Array[String] = {
    val (lo, hi) = seqBounds(pushed)
    if (lo == Long.MinValue && hi == Long.MaxValue) return files
    val firsts = files.map(firstSeq)
    val known = firsts.flatten
    val monotonic = known.length == firsts.length &&
      known.sliding(2).forall(p => p.length < 2 || p(0) < p(1))
    if (!monotonic) return files
    files.indices.filter { i =>
      val startsPastUpper = firsts(i).exists(_ > hi)
      val endsBeforeLower =
        i + 1 < files.length && firsts(i + 1).exists(_ <= lo)
      !startsPastUpper && !endsBeforeLower
    }.map(files).toArray
  }
}

class MessageLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"msglog($path)"
  override def schema(): StructType = MessageLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MessageLogScanBuilder(path)
}

class MessageLogScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = MessageLogSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(MessageLogSource.supported)
    filters // everything re-checked post-scan (parquet row-group model)
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MessageLogScan(path, required, pushed)
}

class MessageLogScan(path: String,
                     required: StructType = MessageLogSource.schema,
                     pushed: Array[Filter] = Array.empty) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"msglog($path) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      MessageLogSource.pruneBySeq(MessageLogSource.listFiles(path), pushed)
        .map(FilePartition(_): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory =
      MsgReaderFactory(required, pushed)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MessageLogMicroBatch(path, required, pushed)
}

case class FileCountOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

/** Offsets denominate POSITIONS in the sorted listing (files consumed),
  * so segment pruning inside a batch's [start, end) slice never moves
  * the offset math — a pruned file is still "consumed". */
class MessageLogMicroBatch(path: String, required: StructType,
                           pushed: Array[Filter]) extends MicroBatchStream {
  override def initialOffset(): Offset = FileCountOffset(0)
  override def latestOffset(): Offset =
    FileCountOffset(MessageLogSource.listFiles(path).length)
  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = MessageLogSource.listFiles(path)
    val s = start.asInstanceOf[FileCountOffset].n
    val e = math.min(end.asInstanceOf[FileCountOffset].n, files.length)
    MessageLogSource.pruneBySeq(files.slice(s, e), pushed)
      .map(FilePartition(_): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    MsgReaderFactory(required, pushed)
}

case class FilePartition(file: String) extends InputPartition

case class MsgReaderFactory(required: StructType,
                            pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MessageLogReader(partition.asInstanceOf[FilePartition].file,
      required, pushed)
}

class MessageLogReader(file: String, required: StructType,
                       pushed: Array[Filter]) extends PartitionReader[InternalRow] {
  MessageLogSource.readersOpened.incrementAndGet()

  // Per-reader projection plan, computed ONCE: the per-row loop below
  // is the hot path column pruning exists to speed up — rebuilding the
  // field-name Seq and string-matching per line would allocate on
  // every record of a multi-million-line segment. The wildcard throw
  // also fires here at reader construction (a FUTURE schema column
  // wrongly wired would otherwise be filled silently). Computed BEFORE
  // the file is opened: a throw here would leak the handle (Spark never
  // receives a reader instance to close) — one leaked fd per task
  // retry, per partition.
  private val colIds: Array[Int] = required.fields.map { f =>
    f.name match {
      case "topic" => 0
      case "message" => 1
      case "data_collector_id" => 2
      case "organization_id" => 3
      case "seq" => 4
      case "arrival_ts" => 5
      case other => throw new IllegalStateException(
        s"MessageLogReader: unhandled projected column '$other'")
    }
  }

  private val mapper = new ObjectMapper()
  private val source = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = source.getLines()
  private var current: InternalRow = _
  private var closed = false

  /** Contract violation (half-written or hand-edited segment) fails
    * LOUDLY with the offending file, never as a bare NPE mid-scan:
    * the writer contract is atomic whole-file publish, so a malformed
    * line means the log is corrupt — silent skipping would turn that
    * into unexplained missing rows. */
  private def requireLong(node: com.fasterxml.jackson.databind.JsonNode,
                          field: String): Long = {
    val v = node.get(field)
    if (v == null || v.isNull) throw new IllegalStateException(
      s"MessageLogReader: record missing '$field' in $file — " +
        "segment violates the atomic-publish writer contract")
    v.asLong()
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      val node =
        try mapper.readTree(line)
        catch { case e: Exception => throw new IllegalStateException(
          s"MessageLogReader: unparseable line in $file — segment " +
            s"violates the atomic-publish writer contract: ${e.getMessage}") }
      val topic =
        if (node.hasNonNull("topic")) node.get("topic").asText else null
      val dc = requireLong(node, "data_collector_id")
      val org = requireLong(node, "organization_id")
      val seq = requireLong(node, "seq")
      if (pushed.forall(MessageLogSource.eval(_, topic, dc, org, seq))) {
        val vals = new Array[Any](colIds.length)
        var i = 0
        while (i < colIds.length) {
          vals(i) = colIds(i) match {
            case 0 => if (topic == null) null else UTF8String.fromString(topic)
            case 1 =>
              // same loud contract as the long fields: message is
              // non-optional downstream (Rec.message: String, the F0a
              // keepalive filter reads its length) — a silent null here
              // surfaces later as an unexplained NPE with no pointer to
              // the corrupt segment
              if (node.hasNonNull("message"))
                UTF8String.fromString(node.get("message").asText)
              else throw new IllegalStateException(
                s"MessageLogReader: record missing 'message' in $file — " +
                  "segment violates the atomic-publish writer contract")
            case 2 => dc
            case 3 => org
            case 4 => seq
            case _ => requireLong(node, "arrival_ts") // epoch micros
          }
          i += 1
        }
        current = InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        return true
      }
    }
    close(); false
  }
  override def get(): InternalRow = current
  override def close(): Unit =
    if (!closed) { closed = true; source.close() }
}
