package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Parquet-footer statistics reads — the zone-map building block shared
  * by the dedup store and the SCD2 live store: a file's [min, max] for
  * its sort-key column is a driver-side METADATA read of the footer,
  * not a data scan, so manifests can carry exact per-file key ranges at
  * one bounded read per written file. */
object Footers {

  /** [min, max] of integer column `column` from `p`'s footer, or None
    * when the file holds no rows. Fails loudly when the footer carries
    * no statistics for the column — a zone map silently built without
    * stats would prune wrongly. */
  def intRange(p: HPath, conf: Configuration, column: String): Option[(Int, Int)] = {
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      if (blocks.map(_.getRowCount).sum == 0) None
      else {
        val stats = blocks.flatMap(_.getColumns.asScala
          .find(_.getPath.toDotString == column).map(_.getStatistics))
        require(stats.nonEmpty && stats.forall(s => s != null && s.hasNonNullValue),
          s"no $column statistics in parquet footer of $p — cannot build zone map")
        Some((stats.map(_.genericGetMin.asInstanceOf[Number].intValue()).min,
          stats.map(_.genericGetMax.asInstanceOf[Number].intValue()).max))
      }
    } finally reader.close()
  }
}
