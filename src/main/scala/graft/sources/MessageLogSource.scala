package graft.sources

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
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
  * sorted directory listing — files must be append-only and named
  * monotonically (e.g. zero-padded sequence numbers), which is exactly
  * what a transport writer produces. Batch reads (replay/tests) see every
  * file at once. One file = one partition: scale ingest by sharding the
  * writer across files.
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
}

class MessageLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"msglog($path)"
  override def schema(): StructType = MessageLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MessageLogScan(path)
}

class MessageLogScan(path: String) extends Scan {
  override def readSchema(): StructType = MessageLogSource.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      MessageLogSource.listFiles(path).map(FilePartition(_): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory = MsgReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MessageLogMicroBatch(path)
}

case class FileCountOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

class MessageLogMicroBatch(path: String) extends MicroBatchStream {
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
    files.slice(s, e).map(FilePartition(_): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory = MsgReaderFactory
}

case class FilePartition(file: String) extends InputPartition

object MsgReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MessageLogReader(partition.asInstanceOf[FilePartition].file)
}

class MessageLogReader(file: String) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val source = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = source.getLines()
  private var current: InternalRow = _
  private var closed = false

  override def next(): Boolean = {
    if (!lines.hasNext) { close(); return false }
    val node = mapper.readTree(lines.next())
    def str(f: String): Any =
      if (node.hasNonNull(f)) UTF8String.fromString(node.get(f).asText) else null
    current = InternalRow(
      str("topic"),
      str("message"),
      node.get("data_collector_id").asLong(),
      node.get("organization_id").asLong(),
      node.get("seq").asLong(),
      node.get("arrival_ts").asLong()) // epoch micros
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit =
    if (!closed) { closed = true; source.close() }
}
