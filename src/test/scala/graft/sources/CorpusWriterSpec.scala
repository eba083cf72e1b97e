package graft.sources

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The write-layout contract: partition dirs exist and prune on read,
  * file counts are bounded, in-file order follows the sort key. */
class CorpusWriterSpec extends SparkSpec {

  test("partitioned sorted write: pruning, file bounds, in-file order") {
    val dir = tempDir("corpus-writer") + "/docs"
    val docs = Tables.load(spark, sf001, "documents")

    CorpusWriter.write(docs, dir, partitionCol = "lang", sortCol = "doc_id",
      maxRecordsPerFile = 100, filesPerPartition = 2)

    // one directory per language
    val dirs = new File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))

    // file-count bound: ≤ filesPerPartition salts × ceil(rows/maxRecords)
    val enFiles = new File(s"$dir/lang=en").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(enFiles.nonEmpty && enFiles.length <= 4, s"${enFiles.length} files")

    // read back: a lang filter prunes to that partition only
    val back = spark.read.parquet(dir)
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan.take(1500))
    assert(pruned.count() === docs.filter(col("lang") === "en").count())

    // every row survived, nothing duplicated
    assert(back.count() === docs.count())

    // in-file order: doc_id non-decreasing within each parquet file
    import spark.implicits._
    val misordered = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("doc_id"))
      .as[(String, Long)]
      .mapPartitions { it =>
        var bad = 0L
        var prev: (String, Long) = ("", Long.MinValue)
        // rows stream in file order within a split
        it.foreach { case (f, id) =>
          if (f == prev._1 && id < prev._2) bad += 1
          prev = (f, id)
        }
        Iterator.single(bad)
      }.reduce(_ + _)
    assert(misordered === 0L, "doc_id out of order inside a file")
  }
}
