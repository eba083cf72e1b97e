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

  private val BlockIdRe =
    """"key"\s*:\s*"block_id"\s*,\s*"value"\s*:\s*"([^"]+)"""".r

  /** Block-commit ids in a batch file, in order — a startup-only scan
    * used by the S4 handshake (full decode happens in `graft.sds.Decode`;
    * the handshake only needs the commit ids). */
  def fileBlockIds(file: String): Seq[String] =
    BlockIdRe.findAllMatchIn(Files.readString(Paths.get(file)))
      .map(_.group(1)).toSeq
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
        new BlockLogMicroBatchStream(path,
          Option(options.get("knownBlockIds")).toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty))
    }
}

/** Offset = number of log files fully consumed (a monotone cursor, like
  * the blocks-table high-water mark of S3). */
private[sources] case class FileCountOffset(count: Int) extends Offset {
  override def json(): String = count.toString
}

/** @param knownIds newest-first block ids this consumer already holds
  *                  (`Scd2Store.lastKnownBlockIds`), passed as the
  *                  `knownBlockIds` option. Drives the S4 handshake when
  *                  a query starts without a Spark checkpoint — store
  *                  bootstrap, or recovery after the checkpoint was lost:
  *                  resume just past the newest known id still in the
  *                  log, falling back window-by-window (and ultimately to
  *                  a genesis full replay) when the log has forked away
  *                  from what we knew. With a live checkpoint Spark never
  *                  calls initialOffset, exactly like the reference only
  *                  negotiating at (re)subscribe time.
  */
private[sources] class BlockLogMicroBatchStream(path: String, knownIds: Seq[String])
    extends MicroBatchStream {

  override def initialOffset(): Offset =
    if (knownIds.isEmpty) FileCountOffset(0)
    else {
      val files = BlockLogSource.listFiles(path)
      // (file index, block id) in consumption order
      val flat = files.zipWithIndex.flatMap { case (f, i) =>
        BlockLogSource.fileBlockIds(f).map(i -> _)
      }
      Negotiate.resumeIndex(knownIds, flat.map(_._2)) match {
        case Left(err) =>
          throw new IllegalStateException(s"S4 handshake failed: $err")
        case Right(0) => FileCountOffset(0) // genesis: full replay
        case Right(n) =>
          // Resume AT the anchor's file unless the anchor closes it: a
          // mid-file anchor must not skip the blocks after it in the same
          // file, and replaying the earlier part is a no-op (idempotent
          // SCD2 merge).
          val anchorFile = flat(n - 1)._1
          val anchorClosesFile = n == flat.length || flat(n)._1 != anchorFile
          FileCountOffset(if (anchorClosesFile) anchorFile + 1 else anchorFile)
      }
    }
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
