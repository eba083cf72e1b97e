package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Layout-controlled parquet write-out for corpus tables — the sink half
  * of the 100 TB story. What matters at scale:
  *
  *  - `partitionBy` on a low-cardinality column (lang, source, date)
  *    gives partition PRUNING on read: a per-language training run reads
  *    only its directories, not 100 TB.
  *  - `sortWithinPartitions` on the primary read key gives parquet
  *    row-group min/max statistics that actually prune (a random row
  *    order makes every row-group's [min,max] span the whole key range —
  *    statistics become useless).
  *  - `maxRecordsPerFile` bounds file sizes without an extra shuffle;
  *    `repartition(n, key)` ahead of the write controls file COUNT (the
  *    small-files problem kills 100 TB metadata handling long before
  *    data volume does).
  *
  * This is deliberately plain `DataFrameWriter` plumbing — the point is
  * the layout contract, tested in `CorpusWriterSpec` (pruned read plans,
  * bounded file sizes), not a new write path.
  */
object CorpusWriter {

  /** Write `df` partitioned by `partitionCol`, each partition's files
    * sorted by `sortCol`, at most `filesPerPartition` files (the salt
    * term of the repartition key) of at most `maxRecordsPerFile` rows
    * per partition directory. */
  def write(df: DataFrame, path: String, partitionCol: String,
            sortCol: String, maxRecordsPerFile: Long = 1000000L,
            filesPerPartition: Int = 1): Unit =
    df.repartition(col(partitionCol), pmod(hash(col(sortCol)), lit(filesPerPartition)))
      .sortWithinPartitions(partitionCol, sortCol)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
}
