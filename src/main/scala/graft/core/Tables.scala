package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the synthetic star-schema tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's scan-level
  * optimizations (predicate pushdown, column pruning, partition-size
  * splitting via spark.sql.files.maxPartitionBytes) apply unchanged at
  * 100 TB — nothing here materializes or collects.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong it arrives as LongType ns.
    * Convert to TimestampType (micro precision, truncating) so that
    * window/date functions work; keep `ts_ns` for exact arithmetic.
    */
  private def normalizeEvents(df: DataFrame): DataFrame = {
    if (df.schema("ts").dataType == LongType) {
      // integer DIV, not `/`: ns-since-epoch (~1.8e18) exceeds double's
      // 2^53 mantissa, so float division would round the microsecond.
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    } else df
  }

  /** Register every table as a temp view named after the file. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
