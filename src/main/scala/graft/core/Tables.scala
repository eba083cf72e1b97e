package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** [[load]] + a repartition to the session's shuffle width. The
    * fixture tables arrive as ONE parquet row group, so any expensive
    * per-row derivation attached directly to the scan (tokenize +
    * explode, shingle hashing, codec synthesis) otherwise runs on a
    * single task no matter how many cores the session has. Use this
    * where the scan feeds heavy row-local compute BEFORE the first
    * exchange; plain [[load]] everywhere the first operator is already
    * a shuffle or the per-row work is trivial. Predicate pushdown and
    * column pruning pass through the Repartition node, so scan-level
    * optimization is unchanged; at 100 TB a real table arrives in many
    * splits and this exchange is noise either way. */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name)
      .repartition(spark.sessionState.conf.numShufflePartitions)

  /** events.ts arrives in one of three parquet encodings depending on
    * the testdata generation: TIMESTAMP(NANOS) (LongType ns under
    * spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP(MICROS) without
    * UTC adjustment (TimestampNTZType), or plain TimestampType. All
    * are normalized to the same engine contract: `ts` TimestampType
    * (UTC session — the same instant DuckDB reads from the naive
    * micros) plus `ts_ns` LongType ns-since-epoch for exact integer
    * arithmetic. Column-level, codegen'd — no shuffle, no UDF. */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // integer DIV, not `/`: ns-since-epoch (~1.8e18) exceeds double's
        // 2^53 mantissa, so float division would round the microsecond.
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case _ =>
        df.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }

  /** Register every table as a temp view named after the file. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
