package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for an ordered "block log": a directory of
  * JSON EventList batch files, one batch per file, consumed in
  * lexicographic order (SURVEY.md §2.1 S1-S4).
  *
  * This is the production-shaped stand-in for the ZMQ validator
  * connector: the MicroBatchStream side implements the same contract the
  * ZMQ source would — `initialOffset` starts at the checkpoint cursor
  * (the catch-up handshake of S3), `latestOffset` observes newly
  * arrived batches (the poll loop of S1), and replay of `[start, end)`
  * is deterministic, which is what makes the SCD2 sink's exactly-once
  * idempotence work end-to-end. A real validator connector swaps the
  * directory listing for the ZMQ subscription (`ZmqSource` scaladoc) and
  * keeps every interface here.
  *
  * Usage: `spark.readStream.format(classOf[BlockLogSource].getName)
  * .option("path", dir).load()` → one `value: STRING` row per batch file.
  *
  * Producer contract: files must be complete when they appear (write to
  * a temp name, then rename) and must sort lexicographically AFTER every
  * already-present file (e.g. zero-padded sequence names like
  * `batch-00042.json`) — the offset is a count over the sorted listing,
  * so an out-of-order name would shift the consumed prefix.
  */
class BlockLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockLogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new BlockLogTable(properties.get("path"))
}

object BlockLogSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Sorted batch files currently in the log. */
  def listFiles(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator.asScala
      .filter(Files.isRegularFile(_))
      .map(_.toString).toSeq.sorted
  }
}

private[sources] class BlockLogTable(path: String) extends Table with SupportsRead {
  require(path != null, "BlockLogSource requires option 'path'")
  override def name(): String = s"blocklog:$path"
  override def schema(): StructType = BlockLogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = BlockLogSource.schema
      override def toBatch: Batch = new BlockLogBatch(path)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BlockLogMicroBatchStream(path)
    }
}

/** Offset = number of log files fully consumed (a monotone cursor, like
  * the blocks-table high-water mark of S3). */
private[sources] case class FileCountOffset(count: Int) extends Offset {
  override def json(): String = count.toString
}

private[sources] class BlockLogMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = FileCountOffset(0)
  override def latestOffset(): Offset =
    FileCountOffset(BlockLogSource.listFiles(path).size)
  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = BlockLogSource.listFiles(path)
    val s = start.asInstanceOf[FileCountOffset].count
    val e = math.min(end.asInstanceOf[FileCountOffset].count, files.size)
    // one partition per file: batches decode in parallel, the SCD2 sink
    // re-establishes block order set-wise (Pipeline.applyBatch).
    files.slice(s, e).map(f => BlockLogPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    BlockLogReaderFactory
}

private[sources] class BlockLogBatch(path: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    BlockLogSource.listFiles(path).map(f => BlockLogPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    BlockLogReaderFactory
}

private[sources] case class BlockLogPartition(file: String) extends InputPartition

private[sources] object BlockLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[BlockLogPartition].file
    new PartitionReader[InternalRow] {
      // contract: next() advances; get() is stable until the next next()
      private val lines = Files.readAllLines(Paths.get(file)).asScala.iterator
        .filter(_.trim.nonEmpty)
      private var current: String = _
      override def next(): Boolean =
        if (lines.hasNext) { current = lines.next(); true } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
